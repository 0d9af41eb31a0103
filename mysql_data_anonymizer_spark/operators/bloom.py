"""Distributed Bloom-filter core shared by decontamination
(`dedup.decontaminate_bloom_hits`) and join pre-filtering
(`joins.bloom_prefiltered_join`).

The split of labor is fixed by design: the HEAVY hashing (xxhash64 over
strings / keys) happens JVM-side inside whole-stage codegen; Python only
ever does vectorized numpy bit arithmetic over Arrow-batched int64 columns.
Positions use Kirsch–Mitzenmacher double hashing — pos_i = (h1 + i*h2)
mod m with uint64 wraparound and m a power of two — so any element is
described by exactly two 64-bit hashes regardless of ``num_hashes``.

100 TB design: the filter is a CONSTANT-SIZE bitset (m_bits/8 bytes)
independent of the element count. Build is one distributed pass emitting
one bitset row per partition, OR-combined on the driver (bounded:
num_partitions x m_bits/8 bytes; a treeAggregate-style two-level OR —
coalesce to sqrt(P) first — halves the driver load if it ever binds).
Probe is map-only against the broadcast bitset. Bloom guarantees NO FALSE
NEGATIVES — the theorem every consumer gates on.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEED2 = 0x9E3779B9  # golden-ratio salt for the second hash lane


def hash_pair(col: Column) -> list[Column]:
    """The two JVM-side 64-bit hash lanes (h1, h2) for one element column."""
    return [F.xxhash64(col).alias("h1"), F.xxhash64(col, F.lit(SEED2)).alias("h2")]


def bits_from_hashes(hashed: DataFrame, m_bits: int, num_hashes: int) -> bytes:
    """OR-combine per-partition Bloom bitsets built from (h1, h2) int64
    hash columns into one driver-side bitset of ``m_bits`` bits."""
    if m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")
    nbytes = m_bits // 8
    mask = np.uint64(m_bits - 1)

    def build(batches):
        import pandas as pd  # executor-side

        buf = np.zeros(nbytes, dtype=np.uint8)
        for pdf in batches:
            h1 = pdf["h1"].to_numpy(dtype=np.int64).view(np.uint64)
            h2 = pdf["h2"].to_numpy(dtype=np.int64).view(np.uint64)
            for i in range(num_hashes):
                idx = (h1 + np.uint64(i) * h2) & mask
                np.bitwise_or.at(
                    buf,
                    (idx >> np.uint64(3)).astype(np.int64),
                    (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)),
                )
        yield pd.DataFrame({"bits": [buf.tobytes()]})

    parts = hashed.mapInPandas(build, "bits binary").collect()
    out = np.zeros(nbytes, dtype=np.uint8)
    for row in parts:
        out |= np.frombuffer(row["bits"], dtype=np.uint8)
    return out.tobytes()


def hit_udf(bc, m_bits: int, num_hashes: int):
    """Arrow-batched membership test against a broadcast bitset: a
    pandas_udf (h1, h2) -> boolean, pure numpy gathers over the batch."""
    from pyspark.sql.functions import pandas_udf

    mask = np.uint64(m_bits - 1)

    @pandas_udf("boolean")
    def _bloom_hit(h1, h2):
        import pandas as pd

        buf = np.frombuffer(bc.value, dtype=np.uint8)
        a = h1.to_numpy(dtype=np.int64).view(np.uint64)
        b = h2.to_numpy(dtype=np.int64).view(np.uint64)
        ok = np.ones(len(a), dtype=bool)
        for i in range(num_hashes):
            idx = (a + np.uint64(i) * b) & mask
            ok &= (
                buf[(idx >> np.uint64(3)).astype(np.int64)]
                >> (idx & np.uint64(7)).astype(np.uint8)
            ) & np.uint8(1) == np.uint8(1)
        return pd.Series(ok)

    return _bloom_hit


def build_over(elements: DataFrame, col: str, m_bits: int, num_hashes: int) -> bytes:
    """Build a bitset over the distinct values of ``elements[col]``."""
    hashed = elements.select(col).distinct().select(*hash_pair(F.col(col)))
    return bits_from_hashes(hashed, m_bits, num_hashes)
