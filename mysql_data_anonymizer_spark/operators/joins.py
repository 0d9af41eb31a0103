"""Join extensions beyond Catalyst's built-ins: as-of and banded range joins.

The reference has no user-facing joins (its only join-like op is the trigger
key cascade, reference src/Anonymizer.php:416-418); these cover the SURVEY
§2.3 join rows (semi/anti/theta are plain ``how=`` arguments; as-of and
range need composition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` within the same ``key`` (time-series as-of).

    Implementation is the union-window pattern, not a range join: tag both
    inputs, union, then ``last_value(right_col) IGNORE NULLS`` over a window
    ordered by (ts, right-first tiebreak) per key. One keyed shuffle total,
    no per-row range probe — at 100 TB this is a single sort-merge-shaped
    pass, where a naive l.ts >= r.ts theta-join would be quadratic.
    Right rows that tie on (key, right_ts) must be pre-deduplicated for a
    deterministic result."""
    lt = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt = (
        right.select(
            F.col(key), F.col(right_ts).alias("__ts"), *[F.col(c) for c in right_cols]
        )
        .withColumn("__side", F.lit(0))
    )
    # align schemas for the union (typed nulls: unionByName rejects NullType)
    l_types = dict(left.dtypes)
    r_types = dict(right.dtypes)
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(l_types[c]))
    for c in right_cols:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None).cast(r_types[c]))
    cols = [key, "__ts", "__side", *[c for c in left.columns if c != key], *right_cols]
    u = lt.select(*cols).unionByName(rt.select(*cols))

    # right rows (side=0) sort before left rows at equal ts => a right row
    # AT the left timestamp is visible (ASOF >= semantics)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in right_cols:
        u = u.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return u.where(F.col("__side") == 1).drop("__side", "__ts")


def point_in_time_join(
    facts: DataFrame,
    dim_history: DataFrame,
    key: str,
    fact_ts: str,
    value_cols: list[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Temporal (point-in-time) join: attach to each fact row the dimension
    version valid at the fact's timestamp — key equality plus
    ``valid_from <= ts < valid_to`` with a NULL ``valid_to`` meaning the
    open (current) interval. The natural consumer of ``scd.scd2_history``
    output.

    Scale shape: the KEY equality is the join condition Catalyst hashes on
    (broadcast or sort-merge — never a BNLJ); the interval predicate rides
    along as a post-join filter. Per-key fanout before that filter is
    bounded by the key's version count, which SCD2 change-compression keeps
    small, so the cost is one keyed shuffle of the fact table — the same
    bound as a plain FK join."""
    f = facts.alias("__f")
    h = dim_history.alias("__h")
    ts = F.col(f"__f.{fact_ts}")
    cond = (
        (F.col(f"__f.{key}") == F.col(f"__h.{key}"))
        & (F.col(f"__h.{valid_from}") <= ts)
        & (F.col(f"__h.{valid_to}").isNull() | (ts < F.col(f"__h.{valid_to}")))
    )
    return f.join(h, cond, "left").select(
        "__f.*", *[F.col(f"__h.{c}") for c in value_cols]
    )


def range_join_banded(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    max_distance: float,
    band_width: float | None = None,
) -> DataFrame:
    """Pure inequality join |left_val - right_val| <= max_distance without an
    equi key, made scalable by banding: each side buckets its value into
    bands of ``band_width`` (default = max_distance), the left side probes
    its own and both neighbor bands, and the exact predicate filters the
    equi-joined candidates. Turns an O(n*m) nested loop into a keyed join
    whose fan-out is bounded by band occupancy."""
    bw = band_width or max_distance
    lb = left.withColumn("__band", F.floor(F.col(left_val) / F.lit(bw)).cast("long"))
    rb = right.withColumn("__band", F.floor(F.col(right_val) / F.lit(bw)).cast("long"))
    probes = F.array(F.col("__band") - 1, F.col("__band"), F.col("__band") + 1)
    lb = lb.withColumn("__band", F.explode(probes))
    out = lb.join(rb, "__band").where(
        F.abs(F.col(left_val) - F.col(right_val)) <= max_distance
    )
    return out.drop("__band").distinct()


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (skewed) fact side, replicate the
    dim side.

    A plain ``fact.join(dim, key)`` shuffles every fact row with the same key
    into ONE reducer — a hot FK (the reference's synchro cascade shape,
    reference src/Anonymizer.php:416-418, where one customer may own millions
    of orders) turns a 1000-executor cluster into a 1-task straggler. Here
    each fact row picks a random-but-deterministic salt in [0, salt_buckets)
    (hash of the whole row's key + a per-row uniform via ``pmod(xxhash64)``),
    the dim side is exploded x salt_buckets, and the join key becomes
    (key, salt) — the hot key's rows spread over ``salt_buckets`` reducers.

    Cost: dim is replicated ``salt_buckets``-fold, so use this when dim is
    small-to-medium but too big (or the join is not inner) for a plain
    broadcast, and the fact side is skewed. AQE's skew-join handles many
    cases adaptively; an explicit salt is the deterministic fallback for
    extreme single-key skew (AQE can only split a partition, not a single
    key's sort group, for non-shuffle-local operations downstream).

    The salt is derived from the fact row's full tuple hash, so the result
    set is identical to the unsalted join (verified in tests) — salting
    changes data placement, never semantics.
    """
    salt = F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in fact.columns])), F.lit(salt_buckets))
    fs = fact.withColumn("__salt", salt.cast("int"))
    ds = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<int>"))
    )
    cond = (fs[fact_key] == ds[dim_key]) & (fs["__salt"] == ds["__salt"])
    out = fs.join(ds, cond, how)
    return out.drop(fs["__salt"]).drop(ds["__salt"])


def bloom_prefiltered_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 20,
    num_hashes: int = 4,
) -> DataFrame:
    """Inner equi-join with a Bloom PRE-FILTER on the fact side — the
    runtime-filter pattern (Spark's own InjectRuntimeFilter, here explicit
    and tunable): the dim side's key set is compressed into a constant-size
    bitset, broadcast, and applied to the fact BEFORE its shuffle, so rows
    that cannot possibly match never enter the exchange. Bloom has no false
    negatives, so the final exact join returns EXACTLY the plain-join rows
    (false positives are eliminated by the join itself) — the identity the
    certification query oracles against.

    When it pays: dim too big to broadcast-hash-join (so Catalyst picks
    SMJ and shuffles the FULL fact) but its key set fits a bloom — at
    100 TB a selective dim cuts the dominant cost, the fact exchange, by
    the join selectivity while shipping only m_bits/8 bytes per executor.
    Build is one pass over dim keys (operators/bloom.py); probe is
    Arrow-batched and map-only against JVM-computed xxhash64 lanes."""
    from mysql_data_anonymizer_spark.operators import bloom

    bits = bloom.build_over(dim, dim_key, m_bits, num_hashes)
    bc = fact.sparkSession.sparkContext.broadcast(bits)
    hit = bloom.hit_udf(bc, m_bits, num_hashes)
    pruned = fact.withColumns(
        {
            "__h1": F.xxhash64(F.col(fact_key)),
            "__h2": F.xxhash64(F.col(fact_key), F.lit(bloom.SEED2)),
        }
    ).where(hit("__h1", "__h2")).drop("__h1", "__h2")
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], "inner")
