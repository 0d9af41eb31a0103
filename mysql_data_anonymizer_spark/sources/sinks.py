"""Writeback sinks — the reference's keyed UPDATE path, re-architected.

The reference emits one ``UPDATE t SET .. WHERE pk=..`` per row over an
async pool (reference src/Anonymizer.php:274-288, 326-334). Spark's JDBC
writer has no UPDATE, so the engine offers three strategies:

1. ``write_parquet`` / ``write_files`` — lake sinks: plain distributed
   overwrite; the default for fixture/test runs.
2. ``updates_via_foreach_partition`` — true in-place parity: each partition
   opens its own DBAPI connection and executes batched parameterized
   UPDATEs (``executemany``), giving the reference's semantics with
   partition-level parallelism instead of an event loop. Idempotent: each
   row is keyed by PK, so retried tasks re-apply the same values.
3. ``staging_swap_sql`` — bulk path for full-table masking: append the
   masked table to a staging table (Spark's native JDBC INSERT path, fully
   parallel), then atomically swap. At 100 TB this is the only strategy
   whose write side scales linearly.
"""

from __future__ import annotations

from typing import Callable, Iterable

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    dynamic: bool = True,
) -> None:
    """Hive-layout partitioned parquet sink — the 100 TB table layout.

    ``dynamic=True`` uses dynamic partition overwrite: an overwrite replaces
    ONLY the partitions present in ``df``, so incremental backfills (one
    day, one source) never clobber the rest of the table. Readers get
    partition PRUNING for free: a filter on a partition column eliminates
    whole directories before any IO (PartitionFilters in the scan —
    asserted in tests), which is what makes date/source-keyed 100 TB tables
    queryable at interactive cost.

    Choose partition columns with bounded cardinality (date, source, lang):
    one directory per value; a high-cardinality key (user_id) creates
    millions of tiny files — use bucketing (sources/bucketing.py) for
    those instead."""
    writer = df.write.mode(mode)
    if dynamic:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.partitionBy(*partition_cols).parquet(path)


def build_update_sql(
    table: str, set_cols: list[str], pk_cols: list[str], quote: str | None = None
) -> str:
    """Parameterized UPDATE (the reference builds these per-row with string
    interpolation and addslashes — src/Anonymizer.php:345-371; we bind
    parameters instead, closing its escaping bug on the replaceByFields
    path, SURVEY §4.2 item 4).

    ``quote`` wraps COLUMN identifiers for case-sensitive targets: Spark's
    JDBC writer creates quoted (case-preserving) columns in Derby, so
    updates back into a Spark-written table need ``quote='"'``; MySQL with
    reserved-word columns takes ``quote='`'``. The table name is passed
    through verbatim (Spark writes it unquoted)."""
    q = (lambda c: f"{quote}{c}{quote}") if quote else (lambda c: c)
    sets = ", ".join(f"{q(c)} = %s" for c in set_cols)
    wheres = " AND ".join(f"{q(c)} = %s" for c in pk_cols)
    return f"UPDATE {table} SET {sets} WHERE {wheres}"


def updates_via_foreach_partition(
    df: DataFrame,
    table: str,
    set_cols: list[str],
    pk_cols: list[str],
    connection_factory: Callable[[], object],
    batch_size: int = 1000,
    paramstyle: str = "%s",
    quote: str | None = None,
) -> None:
    """Execute batched keyed UPDATEs from every partition in parallel.

    ``connection_factory`` runs on the executor and must return a DBAPI
    connection (e.g. a mysql-connector ``connect`` closure, or
    ``sources.jdbc.py4j_dbapi_factory`` for any JDBC driver loaded in the
    driver JVM). ``batch_size`` plays the role of NB_MAX_PROMISE_IN_LOOP
    (reference README.md:36). ``quote`` wraps column identifiers in the
    generated SQL only — row values are still read by the raw name."""
    sql = build_update_sql(table, set_cols, pk_cols, quote=quote)
    if paramstyle != "%s":
        sql = sql.replace("%s", paramstyle)
    cols = list(set_cols) + list(pk_cols)

    def handle_partition(rows: Iterable) -> None:
        conn = connection_factory()
        try:
            cur = conn.cursor()
            batch = []
            for row in rows:
                batch.append(tuple(row[c] for c in cols))
                if len(batch) >= batch_size:
                    cur.executemany(sql, batch)
                    conn.commit()
                    batch.clear()
            if batch:
                cur.executemany(sql, batch)
                conn.commit()
        finally:
            conn.close()

    df.select(*cols).foreachPartition(handle_partition)


def staging_swap_sql(
    table: str, staging: str | None = None, dialect: str = "mysql"
) -> list[str]:
    """DDL sequence for the staging-table swap strategy: write the masked
    DataFrame to ``staging`` with Spark's parallel JDBC INSERT
    (``df.write.format('jdbc').option('dbtable', staging).save()``), then
    run these statements on one control connection.

    ``dialect='mysql'`` uses the single atomic multi-rename (the reference's
    target database); ``dialect='ansi'`` emits one RENAME per statement for
    databases without multi-rename (Derby, Postgres-style) — not atomic
    across statements, so run inside a transaction where the DB allows
    transactional DDL."""
    staging = staging or f"{table}__mda_staging"
    old = f"{table}__mda_old"
    if dialect == "mysql":
        return [
            f"RENAME TABLE {table} TO {old}, {staging} TO {table}",
            f"DROP TABLE {old}",
        ]
    return [
        f"RENAME TABLE {table} TO {old}",
        f"RENAME TABLE {staging} TO {table}",
        f"DROP TABLE {old}",
    ]


def parse_swap_ddl(statements: list[str]) -> dict:
    """Parse a ``staging_swap_sql`` DDL sequence into its SEMANTICS so tests
    can assert the swap CONTRACT instead of string equality (VERDICT r4):

    returns ``{"renames": [(src, dst), ...] in execution order,
    "atomic_rename": bool (all renames in ONE statement — MySQL's
    multi-rename guarantee), "drops": [table, ...]}``.

    The contract any dialect must satisfy for table ``t`` with staging
    ``s``: renames == [(t, old), (s, t)] for some ``old``, and drops ==
    [old] — i.e. the live name atomically (or as atomically as the dialect
    allows) switches from the old rows to the staged masked rows, and the
    old rows are discarded."""
    import re as _re

    renames: list[tuple[str, str]] = []
    atomic = False
    drops: list[str] = []
    for stmt in statements:
        s = stmt.strip().rstrip(";")
        m = _re.match(r"(?i)^RENAME\s+TABLE\s+(.+)$", s)
        if m:
            pairs = [p.strip() for p in m.group(1).split(",")]
            if len(pairs) > 1:
                atomic = True
            for p in pairs:
                pm = _re.match(r"(?i)^(\S+)\s+TO\s+(\S+)$", p)
                if not pm:
                    raise ValueError(f"unparseable rename clause: {p!r}")
                renames.append((pm.group(1), pm.group(2)))
            continue
        m = _re.match(r"(?i)^DROP\s+TABLE\s+(\S+)$", s)
        if m:
            drops.append(m.group(1))
            continue
        raise ValueError(f"unexpected statement in swap DDL: {stmt!r}")
    return {"renames": renames, "atomic_rename": atomic, "drops": drops}


def assert_swap_contract(statements: list[str], table: str, staging: str) -> None:
    """Raise AssertionError unless ``statements`` implement the staging-swap
    contract for (table, staging) — see ``parse_swap_ddl``."""
    sem = parse_swap_ddl(statements)
    renames = sem["renames"]
    assert len(renames) == 2, f"expected 2 renames, got {renames}"
    (src1, old), (src2, dst2) = renames
    assert src1 == table, f"first rename must move the live table: {renames}"
    assert (src2, dst2) == (staging, table), f"second rename must promote staging: {renames}"
    assert old not in (table, staging), f"old-name collision: {renames}"
    assert sem["drops"] == [old], f"must drop exactly the parked old table: {sem}"


def write_jdbc_staging(
    df: DataFrame,
    url: str,
    table: str,
    options: dict[str, str],
    staging: str | None = None,
) -> list[str]:
    """Parallel-append the masked table to staging; returns the swap DDL the
    caller executes on a control connection (kept separate so tests can
    exercise the write without a live MySQL)."""
    staging = staging or f"{table}__mda_staging"
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", staging)
        .options(**options)
        .mode("overwrite")
        .save()
    )
    return staging_swap_sql(table, staging)


def jdbc_upsert_merge_sql(
    target: str,
    staging: str,
    key_cols: list[str],
    set_cols: list[str],
    quote: str = '"',
    dialect: str = "ansi",
) -> str:
    """Set-based upsert DDL: merge the staged micro-batch into ``target``
    keyed on ``key_cols`` — the scalable streaming-writeback statement. One
    statement upserts the whole batch; per-row driver round-trips never
    happen, and re-merging the same keys overwrites idempotently —
    at-least-once delivery upstream becomes exactly-once effect in the
    table.

    ``dialect='ansi'``: ANSI MERGE (Derby 10.11+, Postgres 15+, Oracle,
    SQL Server) — exercised live against Derby by the streaming upsert
    tests. ``dialect='mysql'``: the reference's target database has no
    MERGE; the equivalent is ``INSERT .. SELECT .. ON DUPLICATE KEY
    UPDATE`` keyed by the table's PRIMARY/UNIQUE index, which must be on
    ``key_cols`` (string-contract-tested; no MySQL exists in this
    environment to execute it). MySQL default quote is the backtick."""
    if dialect == "mysql" and quote == '"':
        quote = "`"
    q = lambda c: f"{quote}{c}{quote}" if quote else c
    all_cols = list(key_cols) + list(set_cols)
    ins_cols = ", ".join(q(c) for c in all_cols)
    if dialect == "mysql":
        sel = ", ".join(f"s.{q(c)}" for c in all_cols)
        updates = ", ".join(f"{q(c)} = VALUES({q(c)})" for c in set_cols)
        return (
            f"INSERT INTO {target} ({ins_cols}) "
            f"SELECT {sel} FROM {staging} s "
            f"ON DUPLICATE KEY UPDATE {updates}"
        )
    on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in key_cols)
    sets = ", ".join(f"{q(c)} = s.{q(c)}" for c in set_cols)
    ins_vals = ", ".join(f"s.{q(c)}" for c in all_cols)
    return (
        f"MERGE INTO {target} t USING {staging} s ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    )
