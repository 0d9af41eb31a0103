"""Distributed sweep-line over intervals: max concurrency without a
single-partition global window.

The classic interval-overlap questions ("how many sessions are open at
once?", "peak concurrent viewers per channel") are one sorted scan on a
single machine — but a naive Spark translation is a window partitioned only
by the series key, i.e. ONE task per key doing a full sort of that key's
boundary events. Fine for 25 keys at sf0.1; a disaster when one key holds
10^11 boundaries at 100 TB.

``max_concurrency`` instead runs the textbook two-phase distributed prefix
sum (the same shape every parallel-scan paper uses, e.g. Blelloch 1990):

1. explode each interval into (+1 at start, -1 at end) boundary rows;
2. LOCAL pass: cumulative sum within (key, coarse time bucket) — that
   window is partitioned by (key, bucket), so parallelism scales with the
   time range, not the key count;
3. OFFSET pass: per-bucket delta totals (one row per key x bucket —
   post-aggregation tiny) get a prefix sum per key on the tiny table, and
   broadcast-join back as the bucket's starting offset;
4. global running count = bucket offset + local cumulative; one hash
   aggregate takes the max and its earliest peak time.

Tie semantics: boundaries order by (t, delta), so at equal timestamps ends
(-1) sort before starts (+1) — touching intervals do NOT overlap. The
cumulative windows use RANGE/peer framing (both engines' default), which
makes every peer row carry the run value AFTER the whole tie group; the
per-key max and its earliest timestamp are therefore deterministic even
with duplicate boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def max_concurrency(
    intervals: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    bucket: str = "day",
) -> DataFrame:
    """Per-key maximum number of simultaneously open [start, end) intervals
    and the earliest instant the peak is reached.

    Returns ``(key_col, max_concurrent, peak_ts)``. Rows with a NULL key,
    start, or end are ignored (an unbounded interval has no sweep events;
    both engines would also order NULLs differently).
    """
    iv = intervals.where(
        F.col(key_col).isNotNull()
        & F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
    )
    starts = iv.select(
        F.col(key_col).alias("k"), F.col(start_col).alias("t"), F.lit(1).alias("delta")
    )
    ends = iv.select(
        F.col(key_col).alias("k"), F.col(end_col).alias("t"), F.lit(-1).alias("delta")
    )
    b = starts.unionAll(ends).withColumn("bucket", F.date_trunc(bucket, F.col("t")))

    # local cumulative within (key, bucket) — RANGE frame over (t, delta)
    local_w = (
        Window.partitionBy("k", "bucket")
        .orderBy("t", "delta")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    b = b.withColumn("local_cum", F.sum("delta").over(local_w).cast("long"))

    # per-bucket totals -> per-key prefix of PRIOR buckets (tiny table:
    # one row per key x bucket regardless of input size)
    totals = b.groupBy("k", "bucket").agg(F.sum("delta").cast("long").alias("tot"))
    off_w = (
        Window.partitionBy("k")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "offset", F.coalesce(F.sum("tot").over(off_w), F.lit(0)).cast("long")
    ).select("k", "bucket", "offset")

    runs = b.join(F.broadcast(offsets), ["k", "bucket"]).withColumn(
        "run", F.col("offset") + F.col("local_cum")
    )
    # one pass: max_by over the lexicographic (run, -t) struct picks the max
    # run and, among its peak rows, the EARLIEST t — no second scan of the
    # boundary table to locate the argmax. The tie-break negates
    # unix_micros(t), NOT a cast-to-long (which truncates to whole seconds
    # and leaves sub-second boundary ties nondeterministic — ADVICE r6;
    # the oracle computes an exact MIN(t) among peaks).
    return runs.groupBy("k").agg(
        F.max("run").alias("max_concurrent"),
        F.max_by(
            "t", F.struct(F.col("run"), (-F.unix_micros(F.col("t"))).alias("nt"))
        ).alias("peak_ts"),
    ).select(F.col("k").alias(key_col), "max_concurrent", "peak_ts")
