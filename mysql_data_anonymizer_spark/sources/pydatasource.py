"""Custom connector via the Python DataSource API (Spark 4).

The reference reads only from MySQL; this engine's connector surface is
extensible in pure Python: ``SynthRowsDataSource`` is a deterministic
synthetic-row source registered as ``spark.read.format("synthrows")`` —
the pattern a team would use to wrap an internal REST/queue/file format
without touching the JVM.

Design points that make it a real scale-out source, not a toy:
- ``partitions()`` splits the id range into ``n_partitions`` contiguous
  slices, so Spark schedules one task per slice and the generator runs
  executor-side in parallel — the driver never materializes rows;
- rows derive from md5(seed:column|id) — the same hash-constructed
  determinism contract as functions/generator.py, so any row is
  reproducible from its id alone (and a DuckDB oracle can replay the whole
  source from generate_series);
- pushdown: Spark applies filters/pruning above this source; a production
  wrapper would additionally honor ``pushFilters`` for source-side pruning.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SYNTH_SEED = 42


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SynthRowsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self):
        step = max(1, -(-self.n_rows // self.n_partitions))
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            d = hashlib.md5(f"{SYNTH_SEED}:email|{i}".encode()).hexdigest()
            yield (i, f"u_{d[:12]}@example.com", int(d[:8], 16) % 10)


class SynthRowsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthrows"

    def schema(self) -> str:
        return "id long, email string, bucket long"

    def reader(self, schema):
        return SynthRowsReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the synthrows format on a session."""
    spark.dataSource.register(SynthRowsDataSource)


# ---------------------------------------------------------------------------
# Streaming Python DataSource — the micro-batch face of the same connector
# ---------------------------------------------------------------------------
class SynthStreamReader(DataSourceStreamReader):
    """Full ``DataSourceStreamReader`` (not the Simple driver-side variant):
    offsets advance ``batch_rows`` ids per micro-batch, each batch's id
    range splits into ``n_partitions`` slices, and row generation runs
    EXECUTOR-side per slice — the shape a production wrapper around a
    queue/changefeed uses (driver tracks offsets; partitions scale out)."""

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.batch_rows = int(options.get("batch_rows", 250))
        self.n_partitions = int(options.get("n_partitions", 4))
        self._pos = 0

    def initialOffset(self):
        return {"i": 0}

    def latestOffset(self):
        self._pos = min(self._pos + self.batch_rows, self.n_rows)
        return {"i": self._pos}

    def partitions(self, start, end):
        lo, hi = start["i"], end["i"]
        step = max(1, -(-(hi - lo) // self.n_partitions))
        return [_RangePartition(a, min(a + step, hi)) for a in range(lo, hi, step)]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            d = hashlib.md5(f"{SYNTH_SEED}:email|{i}".encode()).hexdigest()
            yield (i, f"u_{d[:12]}@example.com", int(d[:8], 16) % 10)

    def commit(self, end):
        pass


class SynthStreamDataSource(DataSource):
    """``spark.readStream.format("synthstream")`` — deterministic bounded
    changefeed: same md5-constructed rows as ``synthrows``, delivered as
    micro-batches. Because every row derives from its id, a DuckDB oracle
    replays the whole stream from generate_series once it is drained."""

    @classmethod
    def name(cls) -> str:
        return "synthstream"

    def schema(self) -> str:
        return "id long, email string, bucket long"

    def streamReader(self, schema):
        return SynthStreamReader(self.options)


def register_stream(spark) -> None:
    """Idempotent registration of the synthstream format on a session."""
    spark.dataSource.register(SynthStreamDataSource)
