"""Count-min sketch — sublinear frequency estimation (Cormode & Muthukrishnan,
J. Algorithms 2005), the mergeable-sketch counterpart of HLL (cardinality)
and Bloom (membership) already in the engine.

Everything stays JVM-side in whole-stage codegen: the d hash lanes are
``xxhash64(key, lane)`` columns, the sketch build is ONE map-side-combinable
aggregate over (lane, bucket) cells, and estimation joins the (tiny,
broadcast) cell table back onto the keys. No Python, no UDFs.

100 TB design: the sketch is a CONSTANT d x w cell grid (e.g. 4 x 2048 =
8K longs) independent of input size — partial aggregation means each task
emits at most d*w cells regardless of rows scanned, the shuffle is bounded
by d*w per task, and the estimate join broadcasts the grid. Sketches from
disjoint corpora merge by cell-wise addition (union by groupBy-sum over the
same keys), which is what makes per-shard build + global merge work.

Guarantees gated by consumers:
  - est >= exact ALWAYS (each lane only ever over-counts) — a theorem.
  - est <= exact + eps*N with probability 1 - delta, eps = e/width,
    delta = e^-depth — the probabilistic accuracy contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lanes(key: Column, depth: int, width: int) -> Column:
    """Array of (lane, bucket) structs — the d hash positions of one key."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("lane"),
                F.pmod(F.xxhash64(key, F.lit(i)), F.lit(width)).alias("bucket"),
            )
            for i in range(depth)
        ]
    )


def cms_cells(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 2048
) -> DataFrame:
    """Build the sketch: one row per touched (lane, bucket) cell with its
    count. Exactly one keyed shuffle, map-side combined; at most d*w rows
    come out regardless of input size."""
    lb = df.select(F.explode(_lanes(F.col(key_col), depth, width)).alias("lb"))
    return lb.groupBy(
        F.col("lb.lane").alias("lane"), F.col("lb.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cell_cnt"))


def cms_key_estimates(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 2048
) -> DataFrame:
    """Per-distinct-key exact count AND count-min estimate, side by side
    (the certification shape: the exact column is the oracle twin, the
    estimate feeds theorem/accuracy gates).

    The cell grid is d*w rows — broadcast; the key table explodes into d
    lanes and min-reduces the joined cell counts. Keys that exist in ``df``
    always hit populated cells, so the inner join is lossless."""
    cells = cms_cells(df, key_col, depth, width)
    keys = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("exact_cnt"))
    kl = keys.select(
        key_col,
        "exact_cnt",
        F.explode(_lanes(F.col(key_col), depth, width)).alias("lb"),
    ).select(key_col, "exact_cnt", F.col("lb.lane").alias("lane"), F.col("lb.bucket").alias("bucket"))
    return (
        kl.join(F.broadcast(cells), ["lane", "bucket"])
        .groupBy(key_col, "exact_cnt")
        .agg(F.min("cell_cnt").alias("cms_est"))
    )
