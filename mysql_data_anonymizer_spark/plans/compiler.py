"""MaskingPlan -> DataFrame compiler.

The reference executes a plan as: pruned SELECT (+ globalWhere) then one
client-built ``UPDATE ... SET col=CASE WHEN ... END WHERE pk=...`` per row
(reference src/Anonymizer.php:298-371). Here the whole plan compiles to a
single declarative DataFrame:

    read -> filter(globalWhere) -> [row-index] -> ordered withColumn chain
         -> unionByName(rows failing globalWhere, untouched)

so Catalyst gets one logical plan to optimize (column pruning + predicate
pushdown to the parquet/JDBC scan come free) and whole-stage codegen
vectorizes the mask expressions that the reference evaluated row-at-a-time.

Semantics preserved from the reference:
  - per-column ``where`` guard == CASE WHEN guard (src/Anonymizer.php:361-367)
    -> ``F.when(expr, new).otherwise(col)``;
  - left-to-right intra-row visibility: later masks see earlier masks'
    outputs (src/Anonymizer.php:345-371) -> sequential ``withColumn``;
  - ``#row#`` counts rows of the *filtered* result set (src/Anonymizer.php:166-179)
    -> row index computed after the globalWhere split;
  - rows failing globalWhere are never touched -> re-unioned unchanged.

Deliberate divergences (SURVEY §4.2): row order is primary-key ascending
(deterministic), values stay typed (no stringly writeback), NULLs survive
unless masked.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DataType

from mysql_data_anonymizer_spark.functions.generator import (
    DeterministicGenerator,
    PyRowGenerator,
)
from mysql_data_anonymizer_spark.functions.rownum import with_row_index
from mysql_data_anonymizer_spark.plans.plan import ColumnMask, MaskingPlan

ROW_COL = "__mda_row"
KEY_COL = "__mda_key"

# Error types that signal "this closure is not Column-expressible" when
# probed with a DeterministicGenerator: host-language ops on a Column raise
# TypeError/ValueError, unknown formatter names raise AttributeError, and
# eagerly-evaluated Column ops can surface py4j-side errors.
try:  # py4j ships with pyspark, but guard the import for stub environments
    from py4j.protocol import Py4JError

    _COLUMN_INEXPRESSIBLE: tuple = (TypeError, AttributeError, ValueError, Py4JError)
except ImportError:  # pragma: no cover
    _COLUMN_INEXPRESSIBLE = (TypeError, AttributeError, ValueError)


@dataclass
class CompiledTable:
    """Masked table + the old->new key mappings for synchro propagation."""

    df: DataFrame
    key_mappings: dict[str, DataFrame] = field(default_factory=dict)


def compile_plan(
    df: DataFrame, plan: MaskingPlan, seed: int = 42, locale: str = "en_US"
) -> CompiledTable:
    plan.validate(df.columns)
    original_cols = list(df.columns)
    types = {f.name: f.dataType for f in df.schema.fields}

    # canonical row key (composite pks joined) — drives generator seeding
    key_expr = (
        F.col(plan.primary[0]).cast("string")
        if len(plan.primary) == 1
        else F.concat_ws("|", *[F.col(k).cast("string") for k in plan.primary])
    )

    # -- globalWhere split (rows not matching are never touched) ----------
    gw = plan.global_where_sql
    if gw is not None:
        cond = F.expr(gw)
        masked = df.filter(cond)
        untouched = df.filter(~F.coalesce(cond, F.lit(False)))
    else:
        masked, untouched = df, None

    # -- row index over the filtered set, pk-ascending --------------------
    if plan.needs_row_number():
        masked = with_row_index(masked, plan.primary, ROW_COL)
    masked = masked.withColumn(KEY_COL, key_expr)

    # -- stash pre-images of synchro source columns -----------------------
    synchro_srcs = {c.name for c in plan.columns if c.synchro}
    for src in synchro_srcs:
        masked = masked.withColumn(f"__mda_old_{src}", F.col(src))

    # -- ordered mask chain ------------------------------------------------
    for mask in plan.columns:
        new_val = _mask_expression(masked, mask, seed, types[mask.name], locale)
        if mask.where is not None:
            new_val = F.when(F.expr(mask.where), new_val).otherwise(F.col(mask.name))
        masked = masked.withColumn(mask.name, new_val)

    # -- key mappings (old, new) distinct, from the masked subset ---------
    key_mappings = {
        src: masked.select(
            F.col(f"__mda_old_{src}").alias("__old"), F.col(src).alias("__new")
        ).distinct()
        for src in synchro_srcs
    }

    out = masked.select(*original_cols)
    if untouched is not None:
        out = out.unionByName(untouched.select(*original_cols))
    return CompiledTable(df=out, key_mappings=key_mappings)


def _mask_expression(
    df: DataFrame, mask: ColumnMask, seed: int, dtype: DataType, locale: str = "en_US"
) -> Column:
    """Compile one ColumnMask into the replacement Column."""
    if mask.replace_by_fields is not None:
        return _row_udf_expression(
            df, mask.replace_by_fields, mask, seed, dtype, row_arg=True, locale=locale
        )

    if mask.generator_formatter is not None:
        gen = DeterministicGenerator(
            seed, F.col(KEY_COL), mask.name, unique=mask.unique, locale=locale
        )
        val = getattr(gen, mask.generator_formatter)
        return val() if callable(val) else val

    rep = mask.replace
    if isinstance(rep, Column):
        return rep
    if callable(rep):
        gen = DeterministicGenerator(
            seed, F.col(KEY_COL), mask.name, unique=mask.unique, locale=locale
        )
        try:
            result = rep(gen)
        except _COLUMN_INEXPRESSIBLE:
            # the closure applied host-language operations a Column can't
            # satisfy (str methods, int(), custom formatter names, eager
            # Column ops surfacing as py4j errors...) -> re-run it per row
            # in the Python path. Only these "not Column-expressible" error
            # types reroute; genuine bugs (KeyError, ZeroDivisionError, ...)
            # propagate to the caller. Supported closure contract
            # (Blueprint.replace_with): EITHER compose Column expressions
            # from the generator's formatters (fast JVM path), OR use
            # arbitrary pure Python — signalled by one of the reroute error
            # types on the Column probe — which runs per row in a pandas
            # UDF. Closures must be pure: the Python path re-evaluates them.
            return _row_udf_expression(
                df, rep, mask, seed, dtype, row_arg=False, locale=locale
            )
        if isinstance(result, Column):
            return result
        return F.lit(result)
    if isinstance(rep, str) and "#row#" in rep:
        return _template_expression(rep)
    return F.lit(rep)


def _template_expression(template: str) -> Column:
    """'email_#row#@x.com' -> concat('email_', row, '@x.com')
    (reference src/Anonymizer.php:236-243)."""
    parts = template.split("#row#")
    pieces: list[Column] = []
    for i, p in enumerate(parts):
        if i > 0:
            pieces.append(F.col(ROW_COL).cast("string"))
        if p:
            pieces.append(F.lit(p))
    return F.concat(*pieces) if len(pieces) > 1 else (pieces[0] if pieces else F.lit(""))


def _row_udf_expression(
    df: DataFrame,
    fn: Callable,
    mask: ColumnMask,
    seed: int,
    dtype: DataType,
    row_arg: bool,
    locale: str = "en_US",
) -> Column:
    """Arbitrary-Python escape hatch: Arrow-batched pandas UDF.
    ``row_arg=True`` is the ``replaceByFields((row, gen) -> v)`` form and
    ships a struct of the (progressively masked) row; ``row_arg=False`` is
    the ``replaceWith(gen -> v)`` closure form and ships ONLY the row key —
    Arrow never transfers columns the closure can't see, so the scan prunes
    to the key. One PyRowGenerator per row, seeded by the pk — reproducible
    anywhere in the cluster. The batch's key column converts to Python
    strings once per Arrow batch (vectorized astype), not per row."""
    col_name, unique = mask.name, mask.unique
    # snapshot the provider registry INTO the UDF closure: python workers
    # are forked processes that re-import this package fresh, so driver-side
    # register_provider() mutations never reach them on their own
    providers = dict(PyRowGenerator._providers)

    if not row_arg:
        # generator-only closure: the key string is the sole input
        @pandas_udf(dtype)
        def _gen_udf(keys: pd.Series) -> pd.Series:
            PyRowGenerator._providers.update(providers)
            out = []
            for key in keys.astype(str):
                out.append(
                    fn(PyRowGenerator(seed, key, col_name, unique=unique, locale=locale))
                )
            return pd.Series(out)

        return _gen_udf(F.col(KEY_COL))

    data_cols = [c for c in df.columns if not c.startswith("__mda_")]

    @pandas_udf(dtype)
    def _udf(batch: pd.DataFrame) -> pd.Series:
        PyRowGenerator._providers.update(providers)
        keys = batch[KEY_COL].astype(str)
        recs = batch[data_cols].to_dict("records")
        out = []
        for key, rec in zip(keys, recs):
            gen = PyRowGenerator(seed, key, col_name, unique=unique, locale=locale)
            out.append(fn(rec, gen))
        return pd.Series(out)

    return _udf(F.struct(*[F.col(c) for c in data_cols], F.col(KEY_COL)))
