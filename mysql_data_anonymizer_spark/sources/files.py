"""File sources: parquet / csv / json with schema normalization.

The reference reads only from MySQL (src/Anonymizer.php:298-317); file
sources are an engine extension so the same masking plans run over data-lake
inputs. Handles the fixtures' quirks (nanosecond parquet timestamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# fixture columns stored as TIMESTAMP(NANOS), unreadable by Spark directly
NANOS_TS_COLUMNS: dict[str, list[str]] = {"events": ["ts"]}


def normalize_nanos_ts(df: DataFrame, cols: list[str]) -> DataFrame:
    """Normalize TIMESTAMP(NANOS) parquet columns to TimestampType micros
    regardless of how the reader surfaced them:

    - ``bigint`` under ``spark.sql.legacy.parquet.nanosAsLong``: ns -> us by
      integer division (truncation, matching DuckDB's parquet conversion);
    - ``timestamp_ntz`` when schema inference ran without the flag: nanos
      already truncated to NTZ micros — cast to TIMESTAMP (session timezone
      is pinned UTC, so the instant is unchanged).

    Both branches yield identical instants, so windows/aggregates and the
    DuckDB oracles agree regardless of which inference path won."""
    dtypes = dict(df.dtypes)
    for c in cols:
        dt = dtypes.get(c)
        if dt == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
        elif dt is not None and dt.startswith("timestamp_ntz"):
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    table_name: str | None = None,
    **options,
) -> DataFrame:
    """Read one table; normalizes nanosecond timestamps to microseconds
    (truncation — matching DuckDB's parquet ns->us conversion, so oracle
    comparisons agree)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "parquet":
        nanos_cols = NANOS_TS_COLUMNS.get(table_name or "", [])
        if nanos_cols:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = reader.options(**options).parquet(path)
        return normalize_nanos_ts(df, nanos_cols)
    if fmt == "csv":
        return reader.options(header="true", inferSchema=schema is None, **options).csv(path)
    if fmt == "json":
        return reader.options(**options).json(path)
    if fmt == "orc":
        return reader.options(**options).orc(path)
    if fmt == "xml":
        # Native XML source (built into Spark 4, SPARK-44265): rowTag
        # selects the repeating element. Ingest-side format for feeds /
        # exports; schema strongly recommended (inference scans twice).
        return reader.options(**options).format("xml").load(path)
    if fmt == "text":
        # Whole-line text source: one (value string) row per line — the
        # rawest ingest shape (logs, JSONL pre-parse, WET/WARC-extracted
        # text). Parse downstream with from_json / regexp_extract.
        return reader.options(**options).text(path)
    if fmt == "binaryFile":
        # Built-in whole-file source for opaque media payloads: one row per
        # file with (path, modificationTime, length, content binary). The
        # reader parallelizes across files and pushes pathGlobFilter /
        # modifiedAfter down to the listing, so a 100 TB media lake scans
        # only the matching objects. (No schema parameter: the source's
        # 4-column schema is fixed by Spark.)
        return spark.read.format("binaryFile").options(**options).load(path)
    raise ValueError(f"unsupported format: {fmt}")
