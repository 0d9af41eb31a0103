"""SparkSession factory + engine configuration.

Replaces the reference's config loader (reference src/Anonymizer.php:63-100,
config/config-sample.php): DB connection knobs become JDBC options, the
concurrency knobs (NB_MAX_MYSQL_CLIENT / NB_MAX_PROMISE_IN_LOOP) become Spark
partition parallelism + writeback batch size.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class EngineConfig:
    """Engine-level configuration (the surviving config-sample.php keys).

    - ``locale``         <- DEFAULT_GENERATOR_LOCALE (config-sample.php:8)
    - ``seed``           global seed for deterministic fake data (new; the
                          reference used Faker's process-global RNG)
    - ``jdbc_num_partitions``  <- NB_MAX_MYSQL_CLIENT (read parallelism)
    - ``writeback_batch_size`` <- NB_MAX_PROMISE_IN_LOOP (rows per
                          executemany batch in the JDBC update sink)
    """

    locale: str = "en_US"
    seed: int = 42
    jdbc_num_partitions: int = 32
    writeback_batch_size: int = 1000
    shuffle_partitions: int = 32
    extra_spark_conf: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        """Validate on construction — the reference type-checks its config and
        hard-exits on error (reference src/Anonymizer.php:63-100); raising
        ValueError is the library equivalent."""
        from mysql_data_anonymizer_spark.functions.generator import LOCALES

        if self.locale not in LOCALES:
            raise ValueError(
                f"unsupported locale {self.locale!r}; available: {sorted(LOCALES)}"
            )
        for knob in ("seed", "jdbc_num_partitions", "writeback_batch_size", "shuffle_partitions"):
            v = getattr(self, knob)
            if not isinstance(v, int) or isinstance(v, bool):
                raise ValueError(f"{knob} must be an int, got {type(v).__name__}")
            if knob != "seed" and v <= 0:
                raise ValueError(f"{knob} must be positive, got {v}")
        if not isinstance(self.extra_spark_conf, dict):
            raise ValueError("extra_spark_conf must be a dict of str -> str")


def get_spark(
    app_name: str = "mysql_data_anonymizer_spark",
    config: EngineConfig | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    AQE is on so runtime stats re-plan skewed joins and coalesce small
    shuffle partitions; Arrow is on for the pandas-UDF slow path.
    """
    config = config or EngineConfig()
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[*]"
    # Make this package importable by Python UDF workers regardless of the
    # caller's cwd: export the repo root on PYTHONPATH before the JVM (and
    # thus the workers' env) is spawned. On a real cluster the equivalent
    # is shipping the package via --py-files / spark.submit.pyFiles.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if repo_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{repo_root}{os.pathsep}{pp}" if pp else repo_root
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(config.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # runtime bloom-filter join pruning prunes the probe-side scan on
        # selective shuffle joins — a large win on 100 TB fact joins, but
        # building the sketch costs ~0.3-0.6s per join at fixture scale
        # while pruning nothing (measured), so it is enabled only when the
        # deployment says the data is big enough to repay it
        .config(
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            os.environ.get("SPARK_GRAFT_RUNTIME_BLOOM", "false"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        # fixtures store TIMESTAMP(NANOS); surface as bigint for explicit
        # ns->us normalization (sources.files.normalize_nanos_ts)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
    )
    for k, v in config.extra_spark_conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
