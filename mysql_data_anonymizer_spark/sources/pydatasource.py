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
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
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


# ---------------------------------------------------------------------------
# Python DataSource WRITER — the sink face of the connector API
# ---------------------------------------------------------------------------
class _StagedFile(WriterCommitMessage):
    def __init__(self, path: str):
        self.path = path


class HexLinesWriter(DataSourceWriter):
    """Partition-parallel sink with TWO-PHASE COMMIT — the exactly-once
    pattern every production sink needs under task retries/speculation:

      1. ``write`` (executor, per partition) serializes its rows to a
         UNIQUELY-NAMED file in a staging dir and returns the name as its
         commit message. A retried/speculative duplicate task writes a
         DIFFERENT staged file.
      2. ``commit`` (driver, once, with the messages of the WINNING task
         per partition only) renames exactly those staged files into the
         target and stamps a _SUCCESS manifest; orphaned staged files from
         losing attempts are never published. ``abort`` removes the
         staging dir wholesale.

    Line format is length-safe and binary-safe: each field is either ``N``
    (NULL) or ``V`` + hex(utf8) — hex, not base64, because Spark's
    ``base64()`` MIME-chunks with embedded CRLFs and corrupts any
    line-oriented protocol. Readers reverse it with unhex/decode in pure
    codegen."""

    def __init__(self, options, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator):
        import os
        import uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        fname = os.path.join(staging, f"part-{uuid.uuid4().hex}.txt")
        with open(fname, "w", encoding="ascii") as fh:
            for row in iterator:
                fields = []
                for v in row:
                    if v is None:
                        fields.append("N")
                    else:
                        fields.append("V" + str(v).encode("utf-8").hex())
                fh.write("|".join(fields) + "\n")
        return _StagedFile(fname)

    def commit(self, messages):
        import os
        import shutil

        # honor mode("overwrite"): clear previously PUBLISHED part files
        # before renaming the new ones in — otherwise old and new data mix
        # while _SUCCESS lists only the new files (ADVICE r6)
        if self.overwrite:
            for name in os.listdir(self.path):
                if name.startswith("part-") and os.path.isfile(
                    os.path.join(self.path, name)
                ):
                    os.remove(os.path.join(self.path, name))
        published = []
        for m in messages:
            base = os.path.basename(m.path)
            dest = os.path.join(self.path, base)
            os.rename(m.path, dest)
            published.append(base)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write("\n".join(sorted(published)))
        # drop the staging dir: losing speculative attempts' orphans would
        # otherwise accumulate forever (abort only runs on failure)
        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)

    def abort(self, messages):
        import os
        import shutil

        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)


class HexLinesDataSource(DataSource):
    """``df.write.format("hexlines").option("path", dir).save()`` — a pure
    Python sink built on the Spark 4 DataSource writer API, completing the
    connector surface (batch reader `synthrows`, stream reader
    `synthstream`, and now a writer). On a cluster the staging/target dir
    is shared storage; the two-phase rename contract is unchanged."""

    @classmethod
    def name(cls) -> str:
        return "hexlines"

    def writer(self, schema, overwrite: bool):
        return HexLinesWriter(self.options, overwrite)


def register_sink(spark) -> None:
    """Idempotent registration of the hexlines sink on a session."""
    spark.dataSource.register(HexLinesDataSource)
