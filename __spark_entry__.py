"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship masking pipeline at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator inventory
(SURVEY.md §2 + north-star extensions) with DuckDB oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Export the repo root for Python UDF workers too: executors inherit the
# driver process env, so if this module is imported before the SparkSession
# exists (the driver contract), pandas-UDF workers can import the package
# regardless of the caller's cwd. get_spark() does the same for library users.
_repo = os.path.dirname(os.path.abspath(__file__))
_pp = os.environ.get("PYTHONPATH", "")
if _repo not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = f"{_repo}{os.pathsep}{_pp}" if _pp else _repo

from pyspark.sql import DataFrame, SparkSession

from mysql_data_anonymizer_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference example.php masking scenario (static, #row#,
    generator, guarded+unique, row-derived chain, key synchro) on the
    sf0.001 customer/orders tables."""
    from pyspark.sql import functions as F

    from mysql_data_anonymizer_spark import Anonymizer

    sf_dir = "/root/testdata/sf0.001"
    anon = Anonymizer(spark)
    anon.register("customer", spark.read.parquet(f"{sf_dir}/customer.parquet"))
    anon.register("orders", spark.read.parquet(f"{sf_dir}/orders.parquet"))

    def bp(t):
        t.primary("c_custkey")
        t.globalWhere("c_acctbal > -900")
        t.column("c_name").replaceWith(lambda g: g.unique().email)
        t.column("c_mktsegment").where("c_acctbal < 0").replaceWith("RISK_#row#")
        t.column("c_custkey").replaceWith(F.col("c_custkey") + F.lit(10**9)).synchronizeColumn(
            ["o_custkey", "orders"]
        )

    anon.table("customer", bp)
    state = anon.run()
    return state["customer"].join(
        state["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
