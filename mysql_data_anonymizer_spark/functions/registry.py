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
