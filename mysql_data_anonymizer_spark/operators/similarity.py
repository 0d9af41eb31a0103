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


DEFAULT_DIM = 64


def dot_expr(a: str | Column, b: str | Column, dim: int | None = DEFAULT_DIM) -> Column:
    """Sequential-order double dot product of two float arrays.

    With a known ``dim`` the sum is unrolled into a left-associative chain of
    element_at products — measured 12x faster than the higher-order
    ``aggregate`` (HOFs are interpreted per element, outside whole-stage
    codegen). Both forms accumulate strictly left-to-right, bit-matching
    DuckDB's sequential list_sum for the oracle."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    if dim is not None:
        out: Column = F.lit(0.0)
        for i in range(dim):
            out = out + F.element_at(ca, i + 1).cast("double") * F.element_at(cb, i + 1).cast(
                "double"
            )
        return out
    prods = F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a: str | Column, dim: int | None = DEFAULT_DIM) -> Column:
    """L2 norm FLOORED at 1e-12 — the same guard the numpy paths apply
    (np.maximum(norm, 1e-12)), so a zero/denormal vector yields cosine ~0
    instead of an ANSI divide-by-zero crash (fuzz finding: one zero
    embedding took down every Column-side cosine query). Oracles replicate
    with GREATEST(sqrt(...), 1e-12)."""
    return F.greatest(F.sqrt(dot_expr(a, a, dim)), F.lit(1e-12))


def cosine_expr(a: str | Column, b: str | Column, dim: int | None = DEFAULT_DIM) -> Column:
    return dot_expr(a, b, dim) / (norm_expr(a, dim) * norm_expr(b, dim))


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    round_digits: int = 4,
    dim: int | None = DEFAULT_DIM,
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
        F.col(qid).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm_expr(vec_col, dim).alias("__qn"),
    )
    c = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        norm_expr(vec_col, dim).alias("__cn"),
    )
    pairs = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn(
        "cosine",
        F.round(dot_expr("__qv", "__cv", dim) / (F.col("__qn") * F.col("__cn")), round_digits),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    out = scored.withColumn("rank", F.row_number().over(w).cast("long")).where(F.col("rank") <= k)
    return out.select("query_id", "neighbor_id", "cosine", "rank")


def matmul_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """BLAS-backed exact top-k: the 100 TB scale path for brute-force search.

    The (small) query set ships to every task as a numpy matrix; each corpus
    partition streams through ``mapInPandas`` computing a blocked matrix
    product (C @ Q^T) and emits only its local top-k per query — a partition
    is reduced to |Q|*k candidate rows, so the final global top-k shuffle is
    tiny. float64 matmul summation order differs from the sequential oracle
    by ~1 ulp, hence the same 4-dp rounding used for ranking elsewhere."""
    import pandas as pd

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_norm = np.maximum(np.linalg.norm(q_mat, axis=1), 1e-12)
    spark = df.sparkSession
    b_q = spark.sparkContext.broadcast((q_ids, q_mat, q_norm))

    out_schema = "query_id long, neighbor_id long, cosine double, rank long"

    def part_topk(batches):
        q_ids_l, q_mat_l, q_norm_l = b_q.value
        best: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            c = np.stack(pdf[vec_col].to_numpy())
            c = c.astype(np.float64)
            c_norm = np.maximum(np.linalg.norm(c, axis=1), 1e-12)
            scores = (c @ q_mat_l.T) / np.outer(c_norm, q_norm_l)  # |C| x |Q|
            scores = np.round(scores, 4)
            for qi, qid in enumerate(q_ids_l):
                mask = ids != qid
                # local top-k via the shared vectorized pool (desc rounded
                # cosine, asc id) — one code path for every ANN candidate
                # pool (PQ/SQ8/IVFPQ use the same _merge_pool)
                best[int(qid)] = _merge_pool(
                    best.get(int(qid)), scores[:, qi][mask], ids[mask], k
                )
        rows = [
            (qid, int(nid), float(cos), 0)
            for qid, (pool_s, pool_i) in best.items()
            for cos, nid in zip(pool_s, pool_i)
        ]
        yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cosine", "rank"])

    local = df.select(id_col, vec_col).mapInPandas(part_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def bucket_expr(vec_col: str, planes: np.ndarray, n_tables: int = 1) -> Column:
    """LSH bucket keys as an array of ``n_tables`` longs.

    Table t's key packs the sign bits of planes [t*b, (t+1)*b) plus the
    table id in the high bits (so keys from different tables never collide).
    Arrow-batched numpy matmul: one (batch x dim) @ (dim x planes) product
    per batch. An expression-based unroll (planes x dim product terms) works
    but its generated code is enormous — measured ~100s of mostly codegen/
    JIT overhead at 8 planes x 64 dims. Bucket assignment has no SQL oracle
    to mirror, so the python path costs nothing in checkability."""
    from pyspark.sql.functions import pandas_udf

    n_planes = planes.shape[0]
    assert n_planes % n_tables == 0
    b = n_planes // n_tables
    planes_t = planes.T.copy()  # dim x n_planes
    bit_w = (1 << np.arange(b)).astype(np.int64)
    table_tag = (np.arange(n_tables, dtype=np.int64) + 1) << 32

    @pandas_udf("array<long>")
    def _buckets(v):
        import pandas as pd

        mat = np.stack(v.to_numpy()).astype(np.float64)  # batch x dim
        bits = (mat @ planes_t) >= 0  # batch x n_planes
        keys = bits.reshape(len(mat), n_tables, b) @ bit_w + table_tag  # batch x tables
        return pd.Series(list(keys))

    return _buckets(F.col(vec_col) if isinstance(vec_col, str) else vec_col)


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 32,
    n_tables: int = 8,
    seed: int = 42,
    multiprobe: bool = True,
    dim: int = 64,
    score_dim: int | None = DEFAULT_DIM,
) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH.

    L tables of b = n_planes/n_tables bits each: a candidate collides with
    the query in ANY table (P = 1-(1-p^b)^L, p = 1 - angle/pi), which keeps
    recall usable even for far-apart neighbors where a single wide key fails
    (measured 0.16 recall with one 8-bit table vs ~0.9 with 8x4 bits on the
    fixture). Multiprobe additionally probes the b Hamming-1 buckets per
    table on the (small) query side. Corpus is exploded x L — the standard
    LSH memory/recall trade — then candidates dedup, exact re-rank.
    Recall < 1 by construction; tested against brute_force_topk recall.

    ``score_dim`` picks the dot-product FORM for the candidate scoring
    (same knob as semantic_dedup_ivf's ``dim``): default = unrolled
    element_at chain, execution-optimal at production candidate volumes;
    explicit ``None`` = higher-order aggregate, bit-identical values with
    ~1.4 s less Catalyst compile per fresh plan — for bounded
    certification corpora where analysis, not execution, dominates."""
    planes = hyperplanes(dim, n_planes, seed)
    b = n_planes // n_tables
    c = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        norm_expr(vec_col, score_dim).alias("__cn"),
        F.explode(bucket_expr(vec_col, planes, n_tables)).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm_expr(vec_col, score_dim).alias("__qn"),
        F.explode(bucket_expr(vec_col, planes, n_tables)).alias("bucket"),
    )
    if multiprobe:
        probes = F.array(
            F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(b)]
        )
        q = q.withColumn("bucket", F.explode(probes))
    pairs = c.join(F.broadcast(q), "bucket").where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn(
        "cosine", F.round(dot_expr("__qv", "__cv", score_dim) / (F.col("__qn") * F.col("__cn")), 4)
    ).select("query_id", "neighbor_id", "cosine").distinct()
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    out = scored.withColumn("rank", F.row_number().over(w).cast("long")).where(F.col("rank") <= k)
    return out.select("query_id", "neighbor_id", "cosine", "rank")


def train_ivf_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Coarse quantizer for IVF: k-means on a seeded driver-side sample.

    Training touches only ``sample_size`` vectors (one pass + tiny collect);
    at 100 TB the corpus is never iterated for training — only for the
    single assignment pass in ``ivf_topk``."""
    frac = min(1.0, sample_size / max(df.count(), 1))
    sample = df.sample(fraction=frac, seed=seed).select(vec_col).collect()
    if not sample:
        raise ValueError("train_ivf_centroids: empty training sample (empty corpus?)")
    x = np.array([r[0] for r in sample], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)  # cosine on normalized vecs
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
    return cents


def ivf_assign_expr(vec_col: str, centroids: np.ndarray, nprobe: int = 1) -> Column:
    """Array of the ``nprobe`` nearest centroid ids for a vector
    (Arrow-batched matmul, same pattern as bucket_expr)."""
    from pyspark.sql.functions import pandas_udf

    cents_t = centroids.T.copy()

    @pandas_udf("array<int>")
    def _cells(v):
        import pandas as pd

        mat = np.stack(v.to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        scores = mat @ cents_t
        top = np.argsort(-scores, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(top))

    return _cells(F.col(vec_col) if isinstance(vec_col, str) else vec_col)


def ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    dim: int | None = DEFAULT_DIM,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their nearest-centroid
    cell (1 assignment each); queries probe their ``nprobe`` nearest cells;
    exact cosine re-rank within probed cells. Search cost drops by
    ~n_cells/nprobe vs brute force; recall governed by nprobe. The
    inverted-file twin of ``lsh_topk`` — data-adaptive cells instead of
    random hyperplanes."""
    cents = centroids if centroids is not None else train_ivf_centroids(
        df, vec_col, n_cells, seed=seed
    )
    c = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        norm_expr(vec_col, dim).alias("__cn"),
        F.explode(ivf_assign_expr(vec_col, cents, 1)).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm_expr(vec_col, dim).alias("__qn"),
        F.explode(ivf_assign_expr(vec_col, cents, nprobe)).alias("cell"),
    )
    pairs = c.join(F.broadcast(q), "cell").where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn(
        "cosine", F.round(dot_expr("__qv", "__cv", dim) / (F.col("__qn") * F.col("__cn")), 4)
    ).select("query_id", "neighbor_id", "cosine").distinct()
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    out = scored.withColumn("rank", F.row_number().over(w).cast("long")).where(F.col("rank") <= k)
    return out.select("query_id", "neighbor_id", "cosine", "rank")


def lsh_bucketed_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 32,
    n_tables: int = 8,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Near-dup candidate pairs via shared LSH bucket (multi-table),
    cosine-verified. The scale path for ``dedup.embedding_near_dup_pairs``."""
    planes = hyperplanes(dim, n_planes, seed)
    withb = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"), norm_expr(vec_col).alias("__n")
    ).withColumn("bucket", F.explode(bucket_expr("__v", planes, n_tables)))
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


def train_pq_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k_codes: int = 16,
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Product-quantization codebooks (Jegou et al. 2011, 'Product
    Quantization for Nearest Neighbor Search'): split the (normalized)
    vector into ``m`` subspaces and k-means each subspace independently on a
    seeded driver-side sample — same bounded-training contract as
    ``train_ivf_centroids`` (the corpus is never iterated for training).
    Returns an (m, k_codes, dim/m) float64 array."""
    frac = min(1.0, sample_size / max(df.count(), 1))
    sample = df.sample(fraction=frac, seed=seed).select(vec_col).collect()
    if not sample:
        raise ValueError("train_pq_codebooks: empty training sample (empty corpus?)")
    x = np.array([r[0] for r in sample], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"vector dim {dim} must divide into m={m} subspaces")
    dsub = dim // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, k_codes, dsub))
    for j in range(m):
        xj = x[:, j * dsub : (j + 1) * dsub]
        cents = xj[rng.choice(len(xj), size=min(k_codes, len(xj)), replace=False)]
        for _ in range(iters):
            d2 = ((xj[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cents)):
                members = xj[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j, : len(cents)] = cents
        if len(cents) < k_codes:  # degenerate tiny sample: pad with repeats
            books[j, len(cents):] = cents[0]
    return books


def pq_encode_expr(vec_col: str, codebooks: np.ndarray) -> Column:
    """PQ codes as array<int> of length m — ~32x smaller than the float
    vector (m bytes of information vs dim*4). Arrow-batched: one
    (batch x dsub x k) distance evaluation per subspace. At 100 TB the codes
    column is what lives hot (RAM/SSD); raw vectors stay cold and are only
    fetched for the final re-rank."""
    from pyspark.sql.functions import pandas_udf

    m, k_codes, dsub = codebooks.shape
    books = codebooks.copy()

    @pandas_udf("array<int>")
    def _encode(v):
        import pandas as pd

        mat = np.stack(v.to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        out = np.empty((len(mat), m), dtype=np.int32)
        for j in range(m):
            xj = mat[:, j * dsub : (j + 1) * dsub]  # batch x dsub
            # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin over codes
            d2 = -2.0 * (xj @ books[j].T) + (books[j] ** 2).sum(axis=1)[None, :]
            out[:, j] = np.argmin(d2, axis=1)
        return pd.Series(list(out))

    return _encode(F.col(vec_col) if isinstance(vec_col, str) else vec_col)


def pq_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k_codes: int = 16,
    refine: int = 8,
    seed: int = 42,
    dim: int | None = DEFAULT_DIM,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """PQ/ADC approximate top-k: the memory-bounded billion-scale ANN path.

    Corpus vectors are PQ-encoded (m small ints each); each query builds an
    m x k_codes lookup table of subspace dot products (LUT[j][c] =
    q_j . codebook[j][c]), so scoring a corpus row is m table lookups + a
    sum — no float vector is touched during the scan (asymmetric distance
    computation). Each partition emits only its local top ``refine*k``
    candidates per query; the tiny candidate set is exactly re-ranked with
    true cosine. Recall < 1 by construction (quantization error in the
    candidate stage); gated against ``brute_force_topk`` like lsh/ivf."""
    import pandas as pd

    books = codebooks if codebooks is not None else train_pq_codebooks(
        df, vec_col, m=m, k_codes=k_codes, seed=seed
    )
    dsub = books.shape[2]
    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_unit = q_mat / np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)
    # LUTs: |Q| x m x k_codes — a few KB, broadcast with the codebooks
    luts = np.einsum("qjd,jkd->qjk", q_unit.reshape(len(q_unit), m, dsub), books)
    spark = df.sparkSession
    b = spark.sparkContext.broadcast((q_ids, books, luts))
    n_cand = refine * k
    out_schema = f"query_id long, {id_col} long"

    def part_candidates(batches):
        q_ids_l, books_l, luts_l = b.value
        # qid -> (scores, ids) numpy pool, kept at <= n_cand via a single
        # C-side lexsort per (query, batch) — deterministic (-score, id)
        # tie-break identical to a stable Python sort, no per-row loop
        best: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            codes = np.empty((len(mat), m), dtype=np.int64)
            for j in range(m):
                xj = mat[:, j * dsub : (j + 1) * dsub]
                d2 = -2.0 * (xj @ books_l[j].T) + (books_l[j] ** 2).sum(axis=1)[None, :]
                codes[:, j] = np.argmin(d2, axis=1)
            # ADC score: sum_j LUT[q][j][code_j] — lookups only
            for qi, qid in enumerate(q_ids_l):
                scores = luts_l[qi][np.arange(m)[None, :], codes].sum(axis=1)
                mask = ids != qid
                best[int(qid)] = _merge_pool(
                    best.get(int(qid)), scores[mask], ids[mask], n_cand
                )
        rows = [
            (qid, int(nid)) for qid, (_, pool_ids) in best.items() for nid in pool_ids
        ]
        yield pd.DataFrame(rows, columns=["query_id", id_col])

    cand = df.select(id_col, vec_col).mapInPandas(part_candidates, out_schema).distinct()
    return _exact_rerank(df, queries, cand, k, id_col, vec_col)

def _exact_rerank(
    df: DataFrame,
    queries: DataFrame,
    cand: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared exact re-rank tail of the quantized-candidate ANN family
    (PQ/ADC and SQ8): true cosine over the tiny candidate set only, with
    the oracle-stable rounding + (score, id) tie-break of
    ``brute_force_topk``.

    Two deliberate divergences from the brute-force scorer, both because
    the candidate set is O(|Q| * refine * k) — tiny by construction:
    (a) ``cand`` is broadcast, so the corpus side is never shuffled for the
    join; (b) the dot/norm use the HIGHER-ORDER ``aggregate`` form
    (dim=None), not the unrolled element_at chain — the ~200-node unrolled
    tree costs ~1.4 s of Catalyst analysis/codegen per fresh plan (measured
    r7), which dwarfs any per-row win when only hundreds of rows are
    scored. Both forms accumulate strictly left-to-right, so values are
    bit-identical. The re-rank is ALWAYS full-vector exact cosine — the
    signature takes no ``dim`` on purpose (r7 ADVICE: a dim parameter that
    scoring ignores lets callers believe a truncated-prefix contract the
    code no longer honors)."""
    c = (
        df.select(
            F.col(id_col), F.col(vec_col).alias("__cv"), norm_expr(vec_col, None).alias("__cn")
        )
        .join(F.broadcast(cand), id_col)
        .withColumnRenamed(id_col, "neighbor_id")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm_expr(vec_col, None).alias("__qn"),
    )
    scored = c.join(F.broadcast(q), "query_id").withColumn(
        "cosine", F.round(dot_expr("__qv", "__cv", None) / (F.col("__qn") * F.col("__cn")), 4)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    out = scored.withColumn("rank", F.row_number().over(w).cast("long")).where(F.col("rank") <= k)
    return out.select("query_id", "neighbor_id", "cosine", "rank")


def _merge_pool(
    prev: tuple[np.ndarray, np.ndarray] | None,
    s: np.ndarray,
    i: np.ndarray,
    n_cand: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Cap a per-query candidate pool at ``n_cand`` by one vectorized
    lexsort on (-score, id) — deterministic tie-break, no per-row Python."""
    if prev is not None:
        s = np.concatenate([prev[0], s])
        i = np.concatenate([prev[1], i])
    if len(s) > n_cand:
        order = np.lexsort((i, -s))[:n_cand]
        s, i = s[order], i[order]
    return (s, i)


def arrow_l2_norms(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector L2 norms through ``mapInArrow`` — the LOWEST-overhead
    Python seam Spark has (raw Arrow RecordBatches in and out: no pandas
    Series materialization, no per-row objects), completing the engine's
    Python-boundary ladder (row UDF < pandas UDF < mapInPandas <
    mapInArrow). The list column is consumed via its Arrow buffers
    directly: one flat float64 square, one cumulative sum, one
    offset-difference gather — vectorized end to end, zero copies beyond
    the cast.

    Same 1e-12 norm floor as ``norm_expr`` (the fuzz-hardened zero-vector
    guard). Summation order differs from the JVM's sequential
    ``aggregate`` fold (cumsum is still sequential but float64 vs the
    JVM's float64 on float32 inputs can differ in the last ulp), so
    consumers compare with a relative tolerance, not equality — the
    certified twin is the JVM expression."""
    import pyarrow as pa

    def batches(it):
        for rb in it:
            ids = rb.column(0)
            emb = rb.column(1)
            offs = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            raw = emb.values
            # NULL elements inside a vector: the JVM fold yields NULL for
            # the whole sum -> norm floors to 1e-12. Mirror that per row —
            # and zero the NaN placeholders FIRST, or one null element
            # poisons the cumulative sum for every later row in the batch
            # (fuzz finding).
            nulls = raw.is_null().to_numpy(zero_copy_only=False).astype(np.float64)
            vals = raw.to_numpy(zero_copy_only=False).astype(np.float64)
            vals[nulls > 0] = 0.0
            # per-SEGMENT sums via reduceat — NOT a global cumsum + diff: a
            # single huge vector (~1e38 elements -> 1e76 squares) in the
            # batch makes every later row's sum a difference of ~1e77
            # giants, catastrophic cancellation wiping 60 digits (fuzz
            # finding). reduceat sums each row independently.
            lo, hi = int(offs[0]), int(offs[-1])
            seg = (vals[lo:hi]) ** 2
            segn = nulls[lo:hi]
            starts = offs[:-1] - lo
            lengths = offs[1:] - offs[:-1]
            valid = lengths > 0
            ssum = np.zeros(len(lengths))
            nnul = np.zeros(len(lengths))
            if seg.size:
                idx = np.minimum(starts, seg.size - 1)
                ssum[valid] = np.add.reduceat(seg, idx)[valid]
                nnul[valid] = np.add.reduceat(segn, idx)[valid]
            norms = np.sqrt(np.maximum(ssum, 0.0))
            norms[nnul > 0] = 0.0
            norms = np.maximum(norms, 1e-12)
            n_dims = lengths
            cols = [ids, pa.array(n_dims), pa.array(norms)]
            names = [id_col, "n_dims", "arrow_norm"]
            # passthrough columns ride the batch unchanged (row-aligned by
            # construction — consumers never need an id join back)
            for i in range(2, rb.num_columns):
                cols.append(rb.column(i))
                names.append(rb.schema.names[i])
            yield pa.record_batch(cols, names=names)

    extra = [c for c in df.columns if c not in (id_col, vec_col)]
    extra_schema = "".join(
        f", {c} {df.schema[c].dataType.simpleString()}" for c in extra
    )
    return df.select(id_col, vec_col, *extra).mapInArrow(
        batches, f"{id_col} long, n_dims long, arrow_norm double{extra_schema}"
    )


def ivfpq_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    nprobe: int = 8,
    m: int = 8,
    k_codes: int = 16,
    refine: int = 8,
    seed: int = 42,
    dim: int | None = DEFAULT_DIM,
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """IVF-PQ composite — the faiss IVFPQ architecture and THE deployed
    billion-scale ANN configuration: the coarse quantizer (trained IVF
    cells) prunes WHICH rows are scored, product quantization prunes WHAT
    is read per row (m code lookups, no floats), and a tiny exact re-rank
    restores precision. Composes the engine's own pieces:
    ``train_ivf_centroids`` + ``train_pq_codebooks`` (both bounded seeded
    samples — the corpus is never iterated for training),
    ``ivf_assign_expr`` for the one-pass cell assignment, the ADC LUT scan
    of ``pq_topk`` restricted to each query's probed cells, and
    ``_exact_rerank``.

    100 TB: search cost is (nprobe/n_cells) * corpus * (m lookups) — both
    factors multiply, which is why this is the shape that survives a
    billion vectors. The probed-cell union is pushed down as a plain
    ``__cell IN (...)`` filter, so with the codes table laid out
    partitioned-by-cell the scan prunes at the file level too."""
    import pandas as pd

    cents = centroids if centroids is not None else train_ivf_centroids(
        df, vec_col, n_cells, seed=seed
    )
    books = codebooks if codebooks is not None else train_pq_codebooks(
        df, vec_col, m=m, k_codes=k_codes, seed=seed
    )
    dsub = books.shape[2]
    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_unit = q_mat / np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)
    luts = np.einsum("qjd,jkd->qjk", q_unit.reshape(len(q_unit), m, dsub), books)
    # probe assignment for the (tiny, already-collected) query set happens
    # driver-side: |Q| x n_cells scores
    probe = np.argsort(-(q_unit @ cents.T), axis=1)[:, :nprobe]
    probes = {int(qid): row.astype(np.int64) for qid, row in zip(q_ids, probe)}
    all_cells = sorted({int(c) for row in probe for c in row})
    spark = df.sparkSession
    # the coarse assignment runs INSIDE the candidate scan (one
    # MapInPandas node instead of ArrowEvalPython + MapInPandas — the
    # corpus vectors cross the Python boundary once, guide §4.1); the
    # cell math is the same (batch x dim) @ (dim x cells) argsort top-1
    # ivf_assign_expr computes, so the candidate set is unchanged. With a
    # codes table PARTITIONED by cell the storage-pruned variant
    # (explicit cell column + IN filter) is the right shape instead —
    # here the cell column is computed on the fly, so no scan pruning was
    # possible either way.
    cents_t = cents.T.copy()
    all_cells_arr = np.array(all_cells, dtype=np.int64)
    b = spark.sparkContext.broadcast(
        (q_ids, books, luts, probes, cents_t, all_cells_arr)
    )
    n_cand = refine * k
    corp = df.select(id_col, vec_col)
    out_schema = f"query_id long, {id_col} long"

    def part_candidates(batches):
        q_ids_l, books_l, luts_l, probes_l, cents_t_l, cells_keep = b.value
        best: dict[int, tuple] = {}
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            cells = np.argsort(-(mat @ cents_t_l), axis=1)[:, 0].astype(np.int64)
            keep = np.isin(cells, cells_keep)
            if not keep.any():
                continue
            ids, cells, mat = ids[keep], cells[keep], mat[keep]
            codes = np.empty((len(mat), m), dtype=np.int64)
            for j in range(m):
                xj = mat[:, j * dsub : (j + 1) * dsub]
                d2 = -2.0 * (xj @ books_l[j].T) + (books_l[j] ** 2).sum(axis=1)[None, :]
                codes[:, j] = np.argmin(d2, axis=1)
            for qi, qid in enumerate(q_ids_l):
                pmask = np.isin(cells, probes_l[int(qid)]) & (ids != qid)
                if not pmask.any():
                    continue
                scores = luts_l[qi][np.arange(m)[None, :], codes[pmask]].sum(axis=1)
                best[int(qid)] = _merge_pool(
                    best.get(int(qid)), scores, ids[pmask], n_cand
                )
        rows = [
            (qid, int(nid)) for qid, (_, pool_ids) in best.items() for nid in pool_ids
        ]
        yield pd.DataFrame(rows, columns=["query_id", id_col])

    cand = corp.mapInPandas(part_candidates, out_schema).distinct()
    return _exact_rerank(df, queries, cand, k, id_col, vec_col)


def sq8_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine: int = 8,
    dim: int | None = DEFAULT_DIM,
) -> DataFrame:
    """Scalar-quantized (SQ8 / int8, the faiss ScalarQuantizer shape)
    approximate top-k — the middle rung of the quantized-ANN ladder between
    raw-float matmul and PQ/ADC: every corpus vector is affinely encoded to
    one uint8 PER DIMENSION (code = round((v - min) / scale)), a 4x memory
    and scan-I/O cut with far less quantization error than PQ's m-subspace
    codes. The candidate scan reconstructs vectors FROM THE CODES ONLY
    (decode is two fused numpy ops feeding one BLAS matmul per batch), each
    partition emits its local top ``refine*k`` per query, and the tiny
    candidate set is exactly re-ranked with true cosine — same
    certification contract as pq_topk (recall gate vs the brute-force
    twin).

    100 TB design: codes + (min, scale) pairs are the hot data (1/4 of
    fp32); raw vectors are touched only for the O(|Q| * refine * k)
    candidates during re-rank. The scan stays Arrow-batched and BLAS-bound;
    no Python per row."""
    import pandas as pd

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_unit = q_mat / np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)
    spark = df.sparkSession
    b = spark.sparkContext.broadcast((q_ids, q_unit))
    n_cand = refine * k
    out_schema = f"query_id long, {id_col} long"

    def part_candidates(batches):
        q_ids_l, q_unit_l = b.value
        best: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            # SQ8 encode: per-vector affine uint8 codes (what the stored
            # representation would be)...
            vmin = mat.min(axis=1)
            scale = np.maximum((mat.max(axis=1) - vmin) / 255.0, 1e-12)
            codes = np.clip(
                np.rint((mat - vmin[:, None]) / scale[:, None]), 0, 255
            ).astype(np.uint8)
            # ...and the scan sees ONLY the codes: decode, normalize, score
            dec = vmin[:, None] + codes.astype(np.float64) * scale[:, None]
            dec /= np.maximum(np.linalg.norm(dec, axis=1, keepdims=True), 1e-12)
            scores_all = q_unit_l @ dec.T
            for qi, qid in enumerate(q_ids_l):
                mask = ids != qid
                best[int(qid)] = _merge_pool(
                    best.get(int(qid)), scores_all[qi][mask], ids[mask], n_cand
                )
        rows = [
            (qid, int(nid)) for qid, (_, pool_ids) in best.items() for nid in pool_ids
        ]
        yield pd.DataFrame(rows, columns=["query_id", id_col])

    cand = df.select(id_col, vec_col).mapInPandas(part_candidates, out_schema).distinct()
    return _exact_rerank(df, queries, cand, k, id_col, vec_col)


# ---------------------------------------------------------------------------
# Hybrid retrieval: lexical ranker + reciprocal-rank fusion
# ---------------------------------------------------------------------------
def lexical_jaccard_topk(
    docs: DataFrame,
    query_docs: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact token-set-Jaccard top-k per query document — the LEXICAL rung
    of hybrid retrieval (the BM25-family complement to dense cosine).

    Scoring is EXACT INTEGER arithmetic end-to-end: ``jacc_sc =
    FLOOR(1e6 * |A∩B| / |A∪B|)`` — the one IEEE division is over exactly
    representable ints and is correctly rounded, so Spark and any ANSI
    engine floor the SAME value (the repo's cross-engine discipline).

    Scale shape mirrors ``brute_force_topk``: the query token sets are
    broadcast, the corpus streams map-side (tokenize + two array ops per
    pair, whole-stage codegen), and the only shuffle is the per-query
    top-k window over |Q|·|corpus| scored rows. When that product is too
    large, block by token prefix / posting lists first
    (``dedup.ngram_jaccard_candidates`` is the bucketed template)."""
    def tok(c: Column) -> Column:
        return F.array_distinct(
            F.filter(F.split(F.trim(F.lower(c)), r"\s+"), lambda t: F.length(t) > 0)
        )

    q = query_docs.select(
        F.col(id_col).alias("query_id"), tok(F.col(text_col)).alias("__qt")
    )
    c = docs.select(
        F.col(id_col).alias("neighbor_id"), tok(F.col(text_col)).alias("__ct")
    )
    pairs = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    inter = F.size(F.array_intersect("__qt", "__ct")).cast("long")
    uni = F.size(F.array_union("__qt", "__ct")).cast("long")
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.when(uni > 0, F.floor(inter * F.lit(1000000).cast("long") / uni))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("jacc_sc"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("jacc_sc"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).where(
        F.col("rank") <= k
    )


def rrf_fuse(
    rankings: list[tuple[str, DataFrame]],
    k: int = 5,
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. SIGIR 2009) of named rankers.

    Each input is ``(name, df)`` with columns (query_id, neighbor_id, rank);
    a candidate absent from a ranker contributes 0 and reports rank -1. The
    fused score is ``sum(FLOOR(1e9 / (rrf_k + rank)))`` — integer-exact and
    engine-independent (same correctly-rounded-division argument as the
    lexical ranker), so the whole output hashes bit-stably.

    Scale: every ranker's candidate list is top-k-bounded (|Q|·k rows), so
    the fusion is a tiny multi-way outer join — negligible next to the
    rankers themselves."""
    contrib = F.floor(F.lit(1000000000).cast("long") / (F.lit(rrf_k) + F.col("rank")))
    fused = None
    for name, df in rankings:
        part = df.select(
            "query_id",
            "neighbor_id",
            F.col("rank").alias(f"{name}_rank"),
            contrib.cast("long").alias(f"__c_{name}"),
        )
        fused = part if fused is None else fused.join(
            part, ["query_id", "neighbor_id"], "full_outer"
        )
    score = None
    for name, _ in rankings:
        c = F.coalesce(F.col(f"__c_{name}"), F.lit(0).cast("long"))
        score = c if score is None else score + c
    fused = fused.withColumn("rrf_score", score.cast("long"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("neighbor_id")
    )
    out_cols = ["query_id", "neighbor_id"] + [
        F.coalesce(F.col(f"{name}_rank"), F.lit(-1).cast("long")).alias(f"{name}_rank")
        for name, _ in rankings
    ] + ["rrf_score"]
    return (
        fused.select(*out_cols, F.row_number().over(w).cast("long").alias("fused_rank"))
        .where(F.col("fused_rank") <= k)
    )


def build_ivf_index(
    df: DataFrame,
    table: str,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    path: str | None = None,
) -> None:
    """Persist the IVF INVERTED FILE: corpus vectors written once, HIVE-
    PARTITIONED by their nearest-centroid cell — the on-disk layout every
    deployed IVF system uses (faiss inverted lists as partition
    directories). A probe then READS ONLY its nprobe cells: partition
    pruning eliminates (n_cells - nprobe)/n_cells of the scan before any
    row is touched, which is the entire point of IVF at 100 TB — the
    session-memoized in-memory variant (`ivf_topk`) prunes compute but
    still scans every row to assign cells per run."""
    assigned = df.select(
        F.col(id_col),
        F.col(vec_col),
        F.element_at(ivf_assign_expr(vec_col, centroids, 1), 1).alias("cell"),
    )
    writer = assigned.write.mode("overwrite").partitionBy("cell").format("parquet")
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def ivf_indexed_topk(
    spark,
    queries: DataFrame,
    table: str,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = DEFAULT_DIM,
) -> tuple[DataFrame, DataFrame]:
    """Probe a persisted IVF inverted file (`build_ivf_index`): assign each
    query its ``nprobe`` nearest cells, collect the probed cell set (tiny
    by the ANN query-set contract — |Q| x nprobe ints), and read the index
    with a LITERAL ``cell IN (...)`` predicate so Catalyst prunes unprobed
    partition directories AT PLAN TIME (static partition pruning — visible
    as PartitionFilters on the scan, deterministic, no AQE/DPP threshold
    dependence). Exact cosine within probed cells, (score, id) tie-broken
    top-k — value-identical to ``ivf_topk`` with the same centroids/nprobe
    (unit-asserted). Returns ``(topk, pruned_scan)`` — the scan DataFrame
    is exposed so callers can gate on its executed plan."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm_expr(vec_col, dim).alias("__qn"),
        F.explode(ivf_assign_expr(vec_col, centroids, nprobe)).alias("cell"),
    )
    probed_cells = sorted(
        {r["cell"] for r in q.select("cell").distinct().collect()}
    )
    corpus = spark.table(table).where(F.col("cell").isin(probed_cells))
    c = corpus.select(
        "cell",
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        norm_expr(vec_col, dim).alias("__cn"),
    )
    pairs = c.join(F.broadcast(q), "cell").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = (
        pairs.withColumn(
            "cosine",
            F.round(dot_expr("__qv", "__cv", dim) / (F.col("__qn") * F.col("__cn")), 4),
        )
        .select("query_id", "neighbor_id", "cosine")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
    return out, corpus


def hard_negative_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_digits: int = 4,
    dim: int | None = DEFAULT_DIM,
) -> DataFrame:
    """Hard-negative mining for contrastive / embedding training: for each
    query (anchor), the ``k`` corpus vectors MOST similar by cosine whose
    label DIFFERS from the anchor's — the negatives closest to the decision
    boundary, the ones a triplet/InfoNCE batch actually learns from
    (random negatives are trivially separable; see e.g. SBERT/DPR hard-
    negative practice). Exact scoring with the brute-force discipline
    (round-4 cosine, (score, id) tie-break) so the DuckDB oracle
    hash-matches. NULL-labeled rows never qualify as negatives (a NULL
    label is unknown, not "different" — the <=> comparison is null-safe).

    Scale shape: anchors broadcast, corpus streams map-side, one window
    per anchor — same contract as brute_force_topk; at corpus scale swap
    candidate generation to the ANN family and post-filter on label
    (mining is recall-tolerant by design: a missed hard negative is
    replaced by the next-hardest)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("query_label"),
        F.col(vec_col).alias("__qv"),
        norm_expr(vec_col, dim).alias("__qn"),
    )
    c = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        F.col(vec_col).alias("__cv"),
        norm_expr(vec_col, dim).alias("__cn"),
    )
    pairs = c.join(
        F.broadcast(q),
        (F.col("query_id") != F.col("neighbor_id"))
        & ~F.col("query_label").eqNullSafe(F.col("neighbor_label"))
        & F.col("neighbor_label").isNotNull(),
    )
    scored = pairs.withColumn(
        "cosine",
        F.round(dot_expr("__qv", "__cv", dim) / (F.col("__qn") * F.col("__cn")), round_digits),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    out = scored.withColumn("rank", F.row_number().over(w).cast("long")).where(
        F.col("rank") <= k
    )
    return out.select(
        "query_id", "query_label", "neighbor_id", "neighbor_label", "cosine", "rank"
    )


def kcenter_select(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    start_id: int = 0,
    round_digits: int = 4,
    dim: int | None = DEFAULT_DIM,
) -> tuple[list[tuple[int, int]], DataFrame]:
    """Greedy farthest-point k-center selection (Gonzalez 1985) — the
    coreset / data-pruning primitive an LLM pipeline uses to pick a small
    maximally-diverse subset (dedup keeps one PER near-dup cluster; this
    keeps the k points that COVER the space, a 2-approximation of the
    optimal k-center cover): start from ``start_id``, then k-1 times pick
    the point FARTHEST from the selected set (max over rows of min over
    centers of squared L2, the |a-c|^2 = |a|^2+|c|^2-2a.c identity, round-4
    + lowest-id tie-break — the kmeans_assign_step discipline, so a DuckDB
    CTE chain replays the selection exactly).

    Driver iteration is the ANN-family trainer pattern (train_ivf_centroids
    collects centroids the same way): each of the k-1 steps collects ONE
    row — the argmax — while the distance scan itself stays distributed
    (map over the corpus + TakeOrdered(1); centers ride along as literal
    arrays, never a shuffle). O(k) passes over the corpus is the textbook
    cost of greedy k-center; at 100 TB k stays small (it is a coreset) and
    each pass is embarrassingly parallel.

    Returns ``(centers, assignment)``: centers as [(rank, id), ...] in
    selection order, assignment as one row per input row —
    (id_col, center_rank, center_id, dist2) for its NEAREST center
    (min dist2, tie broken toward the earlier-selected center)."""
    e = df.select(
        F.col(id_col),
        F.col(vec_col).alias("__v"),
        dot_expr(vec_col, vec_col, dim).alias("__sq"),
    )
    first = e.where(F.col(id_col) == start_id).select(id_col, "__v", "__sq").head()
    if first is None:
        raise ValueError(f"start_id {start_id} not found in {id_col}")
    centers = [(0, first[0], [float(x) for x in first[1]], float(first[2]))]

    def _dist_to(cv: list[float], csq: float) -> Column:
        lit_v = F.array(*[F.lit(x) for x in cv])
        return F.round(
            F.col("__sq") + F.lit(csq) - F.lit(2.0) * dot_expr(F.col("__v"), lit_v, dim),
            round_digits,
        )

    for r in range(1, k):
        dcols = [_dist_to(cv, csq) for (_, _, cv, csq) in centers]
        mind = dcols[0] if len(dcols) == 1 else F.least(*dcols)
        row = (
            e.select(id_col, "__v", "__sq", mind.alias("__d"))
            .orderBy(F.desc("__d"), F.asc(id_col))
            .limit(1)
            .head()
        )
        centers.append((r, row[0], [float(x) for x in row[1]], float(row[2])))

    # nearest-center assignment: array_min over (dist2, rank, id) structs —
    # struct ordering IS the (min dist, earliest center) tie-break, all
    # codegen, no shuffle
    structs = [
        F.struct(
            _dist_to(cv, csq).alias("dist2"),
            F.lit(r).cast("long").alias("center_rank"),
            F.lit(cid).cast("long").alias("center_id"),
        )
        for (r, cid, cv, csq) in centers
    ]
    assignment = e.select(
        id_col, F.array_min(F.array(*structs)).alias("__b")
    ).select(
        id_col,
        F.col("__b.center_rank").alias("center_rank"),
        F.col("__b.center_id").alias("center_id"),
        F.col("__b.dist2").alias("dist2"),
    )
    return [(r, cid) for (r, cid, _, _) in centers], assignment
