"""Similarity search over embedding columns (array<float>).

Two paths:
  - ``brute_force_topk``: exact cosine top-k — the oracle baseline. The dot
    product is a JVM-side ``zip_with`` + sequential ``aggregate`` (double
    accumulation in array order -> bit-reproducible), no Python.
  - ``lsh_topk`` / ``lsh_bucketed_pairs``: random-hyperplane (sign) LSH —
    the 100 TB path. Hyperplanes are seeded numpy vectors baked in as array
    literals; bucketing is an equi-join on the sign-bit key, so candidate
    generation is a keyed shuffle, never all-pairs. Multiprobe = also probe
    buckets at Hamming distance 1 for recall.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: str | Column, b: str | Column) -> Column:
    """Sequential-order double dot product of two float arrays."""
    prods = F.zip_with(
        F.col(a) if isinstance(a, str) else a,
        F.col(b) if isinstance(b, str) else b,
        lambda x, y: x.cast("double") * y.cast("double"),
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a: str | Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: str | Column, b: str | Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries is small (it is broadcast); the corpus side streams through a
    map-side join — no corpus shuffle until the per-query top-k, which is a
    window over |queries| * |corpus| rows partitioned by query (use
    ``lsh_topk`` when that product is too large).

    Rank is computed over cosine rounded to ``round_digits`` (ties broken by
    neighbor id) so results are stable across summation-order differences
    between engines — this is what makes the DuckDB oracle hash-match."""
    qid = query_id_col or id_col
    # norms are per-row: compute once per side, not once per pair
    q = queries.select(
        F.col(qid).alias("query_id"), F.col(vec_col).alias("__qv"), norm_expr(vec_col).alias("__qn")
    )
    c = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        norm_expr(vec_col).alias("__cn"),
    )
    pairs = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn(
        "cosine",
        F.round(dot_expr("__qv", "__cv") / (F.col("__qn") * F.col("__cn")), round_digits),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    out = scored.withColumn("rank", F.row_number().over(w).cast("long")).where(F.col("rank") <= k)
    return out.select("query_id", "neighbor_id", "cosine", "rank")


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def bucket_expr(vec_col: str, planes: np.ndarray) -> Column:
    """Sign-bit bucket key: bit i = (v . plane_i) >= 0."""
    key = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot_expr(vec_col, plane) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        key = key + bit * F.lit(1 << i).cast("long")
    return key


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    multiprobe: bool = True,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket (or, with
    multiprobe, a bucket within Hamming distance 1), exact cosine re-rank
    within candidates. Recall < 1 by construction; tested against
    ``brute_force_topk`` recall, not equality."""
    planes = hyperplanes(dim, n_planes, seed)
    c = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        norm_expr(vec_col).alias("__cn"),
    ).withColumn("bucket", bucket_expr("__cv", planes))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm_expr(vec_col).alias("__qn"),
    ).withColumn("bucket", bucket_expr("__qv", planes))
    if multiprobe:
        probes = F.array(
            F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)]
        )
        q = q.withColumn("bucket", F.explode(probes))
    pairs = c.join(F.broadcast(q), "bucket").where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn(
        "cosine", F.round(dot_expr("__qv", "__cv") / (F.col("__qn") * F.col("__cn")), 4)
    ).select("query_id", "neighbor_id", "cosine").distinct()
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    out = scored.withColumn("rank", F.row_number().over(w).cast("long")).where(F.col("rank") <= k)
    return out.select("query_id", "neighbor_id", "cosine", "rank")


def lsh_bucketed_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Near-dup candidate pairs via shared LSH bucket, cosine-verified.
    The scale path for ``dedup.embedding_near_dup_pairs``."""
    planes = hyperplanes(dim, n_planes, seed)
    withb = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"), norm_expr(vec_col).alias("__n")
    ).withColumn("bucket", bucket_expr("__v", planes))
    a = withb.select(
        F.col("__id").alias("id_a"), F.col("__v").alias("__va"), F.col("__n").alias("__na"), "bucket"
    )
    b = withb.select(
        F.col("__id").alias("id_b"), F.col("__v").alias("__vb"), F.col("__n").alias("__nb"), "bucket"
    )
    cand = a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
    out = cand.withColumn(
        "cosine", F.round(dot_expr("__va", "__vb") / (F.col("__na") * F.col("__nb")), 4)
    )
    return out.where(F.col("cosine") >= threshold).select("id_a", "id_b", "cosine").distinct()
