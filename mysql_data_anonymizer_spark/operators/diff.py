"""Snapshot diff: classify rows between two versions of a table.

The CDC/validation companion to the SCD2 operators (operators/scd.py): given
an old and a new snapshot keyed by primary key, label every key as
``added`` / ``removed`` / ``changed`` / ``unchanged``. This is how a
pipeline validates an incremental load against a full rebuild, audits a
masking run (exactly the rows the blueprint targeted changed — reference
behavior src/Anonymizer.php:274-288 updates in place, so its "diff" is
implicit), or derives a changelog to feed scd2_merge.

Scale shape: ONE full-outer sort-merge join on the primary key — both sides
are fact-sized, so neither broadcasts; AQE handles skew. Comparison columns
ride as null-safe equality predicates in the join projection (codegen), so
no second pass and no per-column shuffle. Pre-bucketing both snapshots on
the pk (sources/bucketing.py) makes the join shuffle-free for repeated
diffing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    pk: list[str],
    compare_cols: list[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Row-status diff of two snapshots.

    Output: pk columns, ``status`` in {added, removed, changed, unchanged},
    and ``old_<c>`` / ``new_<c>`` for every compare column. NULL-safe
    comparison (``<=>``): NULL -> NULL is unchanged, NULL -> value is
    changed."""
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in pk],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in pk],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    cond = None
    for k in pk:
        eq = F.col(f"__ok_{k}") == F.col(f"__nk_{k}")
        cond = eq if cond is None else (cond & eq)
    joined = o.join(n, cond, "full_outer")
    in_old = F.col(f"__ok_{pk[0]}").isNotNull()
    in_new = F.col(f"__nk_{pk[0]}").isNotNull()
    same = None
    for c in compare_cols:
        eq = F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        same = eq if same is None else (same & eq)
    status = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    out = joined.select(
        *[
            F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}")).alias(k)
            for k in pk
        ],
        status.alias("status"),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )
    if not include_unchanged:
        out = out.where(F.col("status") != "unchanged")
    return out
