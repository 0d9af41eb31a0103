"""Helper & provider registries — parity with the reference's autoloaders.

The reference autoloads ``src/helpers/*Helper.php`` (static function
namespaces callable in mask closures, reference src/Anonymizer.php:103-109)
and ``src/providers/*Provider.php`` (custom Faker formatters,
src/Anonymizer.php:111-121). Here:

- helpers are plain Python callables; ``register_helpers`` additionally
  exposes them to SQL (usable inside ``where``/``globalWhere`` raw-SQL
  predicates via ``spark.udf.register``);
- providers are custom generator formatters registered once and then
  available as ``generator.<name>`` in any mask closure, on BOTH generator
  paths (Column-expression and pandas-UDF python twin).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import SparkSession

from mysql_data_anonymizer_spark.functions import generator as gen_mod


def register_helpers(spark: SparkSession, helpers: dict[str, Callable], returnType=None) -> None:
    """Expose python helpers as SQL-callable UDFs (slow path — prefer
    built-in functions inside mask expressions; this exists for raw-SQL
    predicate parity with reference helpers, README.md:104-141)."""
    for name, fn in helpers.items():
        spark.udf.register(name, fn, returnType)


def register_provider(name: str, column_fn: Callable, python_fn: Callable | None = None) -> None:
    """Register a custom generator formatter (reference custom providers,
    README.md:143-177).

    ``column_fn(generator) -> Column`` builds the vectorized expression;
    ``python_fn(py_generator) -> value`` is the pandas-UDF twin for
    arbitrary-closure masks (defaults to raising if the python path is hit).
    """
    gen_mod.DeterministicGenerator._providers[name] = column_fn
    if python_fn is not None:
        gen_mod.PyRowGenerator._providers[name] = python_fn


def unregister_provider(name: str) -> None:
    gen_mod.DeterministicGenerator._providers.pop(name, None)
    gen_mod.PyRowGenerator._providers.pop(name, None)


def autoload_providers(directory: str) -> list[str]:
    """Discover and register every ``*_provider.py`` module in ``directory``
    — the engine's twin of the reference's ``src/providers/*Provider.php``
    autoloader (reference src/Anonymizer.php:111-121).

    Each module must expose ``PROVIDERS``: a dict
    ``name -> (column_fn, python_fn | None)``. Returns registered names."""
    import importlib.util
    import os

    registered: list[str] = []
    for fname in sorted(os.listdir(directory)):
        if not fname.endswith("_provider.py"):
            continue
        spec = importlib.util.spec_from_file_location(fname[:-3], os.path.join(directory, fname))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        for name, fns in getattr(mod, "PROVIDERS", {}).items():
            column_fn, python_fn = fns if isinstance(fns, tuple) else (fns, None)
            register_provider(name, column_fn, python_fn)
            registered.append(name)
    return registered


def autoload_helpers(spark: SparkSession, directory: str) -> list[str]:
    """Discover ``*_helper.py`` modules exposing ``HELPERS`` (dict
    name -> callable) and register them SQL-callable — twin of the
    reference's ``src/helpers/*Helper.php`` autoloader
    (reference src/Anonymizer.php:103-109). Returns registered names."""
    import importlib.util
    import os

    registered: list[str] = []
    for fname in sorted(os.listdir(directory)):
        if not fname.endswith("_helper.py"):
            continue
        spec = importlib.util.spec_from_file_location(fname[:-3], os.path.join(directory, fname))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        helpers = getattr(mod, "HELPERS", {})
        register_helpers(spark, helpers)
        registered.extend(helpers)
    return registered
