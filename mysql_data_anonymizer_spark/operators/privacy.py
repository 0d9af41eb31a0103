"""Privacy auditing & erasure operators: k-anonymity, l-diversity, and
right-to-be-forgotten cascades.

The reference engine masks values but never MEASURES the result
(src/Anonymizer.php has no audit surface); these operators close that loop
for a production anonymization pipeline:

- k-anonymity: every quasi-identifier (QI) combination must be shared by at
  least k rows, or the combination re-identifies individuals.
- l-diversity: within every QI group, the sensitive attribute must take at
  least l distinct values, or group membership leaks the attribute.
- RTBF cascade: erase a subject set from the primary table AND every
  referencing table (the deletion mirror of the FK key-remap synchro,
  anonymizer.py::remap_keys).

Scale shapes: the audits are single hash aggregates on the QI key (map-side
combinable; l-diversity's distinct rides the same shuffle). The cascade is
one keyed anti join per table — the forget-key set broadcasts when small
(the usual case: erasure requests are per-subject), else falls back to a
keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_audit(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """QI combinations violating k-anonymity: one row per group with
    group_size < k. Empty result == the table IS k-anonymous for these
    quasi-identifiers."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .where(F.col("group_size") < k)
    )


def l_diversity_audit(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, l: int
) -> DataFrame:
    """QI groups whose sensitive attribute has fewer than ``l`` distinct
    values. The countDistinct rides the same QI-keyed shuffle as the group
    size — one aggregation pass."""
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.countDistinct(sensitive_col).alias("n_sensitive"),
        )
        .where(F.col("n_sensitive") < l)
    )


def forget_cascade(
    tables: dict[str, DataFrame],
    forget_keys: DataFrame,
    key_cols: dict[str, str],
) -> dict[str, DataFrame]:
    """Right-to-be-forgotten: drop every row whose key column (per-table
    name in ``key_cols``) appears in ``forget_keys`` (single column named
    ``key``). Returns the erased view of every table; each is one LEFT
    ANTI join against the broadcast forget set."""
    out = {}
    fk = F.broadcast(forget_keys.select(F.col("key")))
    for name, df in tables.items():
        kc = key_cols[name]
        out[name] = df.join(fk, df[kc] == fk["key"], "left_anti")
    return out
