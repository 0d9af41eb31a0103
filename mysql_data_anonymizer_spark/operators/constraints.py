"""Declarative data-quality constraint checking (the Deequ/Great-
Expectations shape): a pipeline gate that computes completeness /
uniqueness / range / referential-integrity metrics in ONE pass and emits a
long-form (constraint, metric, passed) report.

The reference engine trusts its input blindly (src/Anonymizer.php reads and
updates with no validation surface); a production anonymization run wants a
pre-flight gate — masking a table whose PK is secretly non-unique corrupts
the keyed UPDATE path silently.

100 TB design: every row-local metric rides ONE aggregate over ONE scan
(Catalyst expands the multi-distinct internally); referential containment
joins the (broadcastable) reference key set BEFORE the aggregate so its
metric shares the same pass. The wide 1-row result unpivots via the
codegen'd `stack` generator — no per-constraint re-scan, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dq_report(
    df: DataFrame,
    metrics: dict[str, Column],
    checks: dict[str, Column],
) -> DataFrame:
    """Compute ``metrics`` (aggregate Columns over ``df``) in one pass and
    unpivot to (constraint, metric, passed) using ``checks`` — per-metric
    boolean expressions over the aggregated row (reference the metric
    aliases). Metric values are doubles (single IEEE divisions of exact
    aggregates stay engine-stable)."""
    wide = df.agg(*[m.alias(k) for k, m in metrics.items()])
    for k in checks:
        if k not in metrics:
            raise ValueError(f"check '{k}' has no matching metric")
    missing = [k for k in metrics if k not in checks]
    if missing:
        # both directions validated (ADVICE r6): a metric without a check
        # would otherwise crash below with a bare KeyError
        raise ValueError(
            f"metrics {missing} have no matching check; every metric needs "
            "a boolean check expression (use lit(True) for report-only "
            "metrics)"
        )
    wide = wide.select(
        *[F.col(k) for k in metrics],
        *[checks[k].alias(f"__ok_{k}") for k in metrics],
    )
    stack_args = ", ".join(
        f"'{k}', CAST({k} AS DOUBLE), __ok_{k}" for k in metrics
    )
    return wide.select(
        F.expr(
            f"stack({len(metrics)}, {stack_args}) AS (constraint, metric, passed)"
        )
    )
