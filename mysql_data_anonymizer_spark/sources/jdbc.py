"""Partitioned JDBC source — the Spark equivalent of the reference's async
MySQL connection pool (reference src/Anonymizer.php:51, README.md:33-36).

The reference parallelizes with NB_MAX_MYSQL_CLIENT concurrent connections
over one streamed SELECT; Spark parallelizes the *read itself*: numPartitions
executors each issue a range-bounded SELECT (partitionColumn BETWEEN lo AND
hi), so a 100 TB table scans as thousands of concurrent range scans with
predicate/column pushdown into the database.

No MySQL server exists in the test environment; the module is exercised
END-TO-END against embedded Derby (the JDBC database bundled with Spark —
see ``derby_config``): real ``format('jdbc')`` reads and writes, the
staging-swap DDL on a control connection, and range-partitioned scans are
all driven by ``tests/test_sources_sinks.py::test_derby_jdbc_end_to_end``
and certified by the ``jdbc_roundtrip_agg`` registry query. Production
retargets MySQL by swapping ``JdbcConfig``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcConfig:
    """Connection settings (config-sample.php keys DB_HOST/DB_PORT/DB_NAME/
    DB_USER/DB_PASSWORD map here; NB_MAX_MYSQL_CLIENT -> num_partitions)."""

    url: str  # e.g. jdbc:mysql://host:3306/db
    user: str = ""
    password: str = ""
    driver: str = "com.mysql.cj.jdbc.Driver"
    num_partitions: int = 32
    fetch_size: int = 10_000

    def base_options(self) -> dict[str, str]:
        opts = {
            "url": self.url,
            "user": self.user,
            "password": self.password,
            "driver": self.driver,
            "fetchsize": str(self.fetch_size),
        }
        return {k: v for k, v in opts.items() if v != ""}


def partition_options(
    config: JdbcConfig,
    partition_column: str | None,
    lower_bound: int | None,
    upper_bound: int | None,
) -> dict[str, str]:
    """Range-partitioning options for a parallel scan. Without a numeric
    partition column the read is a single connection (the reference's
    behavior before its pool kicks in)."""
    if partition_column is None:
        return {}
    if lower_bound is None or upper_bound is None:
        raise ValueError("partitioned JDBC read needs lowerBound and upperBound")
    return {
        "partitionColumn": partition_column,
        "lowerBound": str(lower_bound),
        "upperBound": str(upper_bound),
        "numPartitions": str(config.num_partitions),
    }


def jdbc_reader(
    spark: SparkSession,
    config: JdbcConfig,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    predicate: str | None = None,
) -> DataFrame:
    """Build the partitioned JDBC scan. ``predicate`` (the blueprint's
    globalWhere) is pushed into the remote query via a dbtable subquery —
    matching the reference's server-side WHERE (src/Anonymizer.php:312-314).
    Catalyst additionally pushes filters/column pruning into each range
    query."""
    src = table if predicate is None else f"(SELECT * FROM {table} WHERE {predicate}) t"
    opts = config.base_options() | {"dbtable": src}
    opts |= partition_options(config, partition_column, lower_bound, upper_bound)
    return spark.read.format("jdbc").options(**opts).load()


# ---------------------------------------------------------------------------
# Embedded-Derby harness: the only JDBC database shipped with Spark itself
# (derby*.jar backs the Hive metastore), so the engine's JDBC read/write
# paths can be exercised end-to-end with ZERO extra dependencies. In
# production the same code runs against MySQL by swapping JdbcConfig.
# ---------------------------------------------------------------------------
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_config(db_dir: str, num_partitions: int = 4) -> JdbcConfig:
    """JdbcConfig for an embedded Derby database rooted at ``db_dir``
    (created on first connect). Embedded Derby is single-JVM, which matches
    Spark local mode exactly: every task connects in-process."""
    return JdbcConfig(
        url=f"jdbc:derby:{db_dir}/db;create=true",
        driver=DERBY_DRIVER,
        num_partitions=num_partitions,
    )


class _Py4jDbapiCursor:
    """Minimal DBAPI cursor over a java.sql Connection: just enough surface
    (``executemany`` + ``close``) for ``sinks.updates_via_foreach_partition``.
    Parameters bind through PreparedStatement.setObject — py4j converts
    Python int/float/str/None to the matching java.sql types."""

    def __init__(self, jconn):
        self._jconn = jconn

    def executemany(self, sql: str, rows) -> None:
        ps = self._jconn.prepareStatement(sql)
        try:
            for row in rows:
                for i, v in enumerate(row):
                    ps.setObject(i + 1, v)
                ps.addBatch()
            ps.executeBatch()
        finally:
            ps.close()

    def close(self) -> None:
        pass


class _Py4jDbapiConnection:
    """DBAPI-shaped wrapper around a java.sql Connection obtained through a
    py4j gateway. Owns the gateway: ``close()`` tears both down."""

    def __init__(self, gateway, jconn):
        self._gateway = gateway
        self._jconn = jconn

    def cursor(self) -> _Py4jDbapiCursor:
        return _Py4jDbapiCursor(self._jconn)

    def commit(self) -> None:
        self._jconn.commit()

    def close(self) -> None:
        try:
            self._jconn.close()
        finally:
            self._gateway.close()


def py4j_dbapi_factory(spark: SparkSession, config: JdbcConfig):
    """Build a picklable ``connection_factory`` for
    ``sinks.updates_via_foreach_partition`` that opens a REAL JDBC
    connection from an executor-side Python worker.

    How: the worker opens its own py4j client to the driver's JVM gateway
    (host/port/auth captured here as plain values) and drives
    ``java.sql.DriverManager`` through it — so ANY JDBC driver on the Spark
    classpath (Derby, MySQL, Postgres) serves the reference's per-partition
    batched-UPDATE path (src/Anonymizer.php:274-288) with no Python-side DB
    client installed. In local mode this lands every connection in the one
    JVM that hosts embedded Derby; on a cluster the same factory works for
    network databases (MySQL) since DriverManager runs driver-side per
    connection — for cluster-scale fan-out prefer a native DBAPI driver on
    the executors, this shim is the zero-dependency fallback.

    autoCommit is disabled so the DBAPI ``commit()`` contract holds
    (java.sql forbids explicit commit while autoCommit is on)."""
    gp = spark.sparkContext._gateway.gateway_parameters  # noqa: SLF001
    address, port, token = gp.address, gp.port, gp.auth_token
    url, driver, user, password = config.url, config.driver, config.user, config.password

    def factory():
        from py4j.java_gateway import GatewayParameters, JavaGateway

        gw = JavaGateway(
            gateway_parameters=GatewayParameters(
                address=address, port=port, auth_token=token, auto_convert=True
            )
        )
        try:
            jvm = gw.jvm
            jvm.java.lang.Class.forName(driver)
            dm = jvm.java.sql.DriverManager
            jconn = dm.getConnection(url, user, password) if user else dm.getConnection(url)
            jconn.setAutoCommit(False)
        except Exception:
            gw.close()
            raise
        return _Py4jDbapiConnection(gw, jconn)

    return factory


def run_control_ddl(spark: SparkSession, config: JdbcConfig, statements: list[str]) -> None:
    """Execute DDL (e.g. ``staging_swap_sql``) on ONE control connection via
    the driver JVM — the same role as the reference's single setup
    connection (src/Anonymizer.php:152-157). Uses java.sql.DriverManager
    through py4j, so no Python-side JDBC bridge is needed."""
    jvm = spark._jvm  # noqa: SLF001
    jvm.java.lang.Class.forName(config.driver)
    conn = (
        jvm.java.sql.DriverManager.getConnection(config.url, config.user, config.password)
        if config.user
        else jvm.java.sql.DriverManager.getConnection(config.url)
    )
    try:
        st = conn.createStatement()
        for sql in statements:
            st.execute(sql)
        st.close()
    finally:
        conn.close()
