"""Driver-hasher-compatibility lint.

The driver's CORRECTNESS gate canonicalizes BOTH result sets through pandas
(`df.sort_values` over name-sorted columns, then a value hash). Two result
sets that are value-identical under tools/compare_oracle.py can still fail
that gate when the *pandas dtypes* diverge — every round-1/round-2 hash
failure was in this class:

  - DuckDB widens SUM(int)/SUM(bigint) to HUGEINT (int128); pandas has no
    int128, so the column lands as float64 ("3.0") while Spark emits int64
    ("3") -> hash mismatch.
  - DECIMAL outputs become `object` columns of decimal.Decimal with
    engine-specific trailing-zero forms -> hash mismatch.
  - list/array cells are unhashable -> the canonicalizer CRASHES
    (pandas sort_values -> factorize -> TypeError).

This lint runs every registry query on BOTH engines at a small SF and
fails on any dtype divergence or hazardous dtype, making the whole class
unreintroducible. Wire into the local loop next to plan_audit.

Checks per oracle-gated query:
  1. duckdb `.df()` and Spark `.toPandas()` yield the same column-name set.
  2. No column on either side is decimal.Decimal-typed, list/ndarray-typed,
     or otherwise non-string object dtype.
  3. Normalized dtype kinds match per column (int==int, float==float,
     bool==bool, string==string, datetime==datetime). The int/float split
     is exactly the HUGEINT trap.
  4. Rows-only queries (no oracle) still get checks 2 on the Spark side —
     an array output would crash the driver even without an oracle row.

Usage: python tools/hash_lint.py [sf_dir] [query ...]
Exit code 0 = clean; 1 = violations (listed).
"""

from __future__ import annotations

import datetime as _dt
import decimal
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from mysql_data_anonymizer_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _kind(series: pd.Series) -> str:
    """Collapse a column to the equivalence class the driver's hash cares
    about. Object columns are classified by their first non-null cell so a
    Spark DATE column (object-of-datetime.date) pairs with DuckDB's
    datetime64."""
    k = getattr(series.dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    for v in series:
        if v is None or (isinstance(v, float) and np.isnan(v)):
            continue
        if isinstance(v, (_dt.date, _dt.datetime)):
            return "datetime"
        break
    return "object"


def _object_cell_problem(series: pd.Series) -> str | None:
    """For an object column, identify a non-string cell type that would
    break or destabilize the driver's hash. Strings are fine; so are
    datetime.date cells — Spark DATE columns land in pandas as object-of-
    date and the driver hashes them green (mask_generator_profile, r2)."""
    for v in series:
        if v is None or (isinstance(v, float) and np.isnan(v)):
            continue
        if isinstance(v, decimal.Decimal):
            return "decimal.Decimal cell (decimal output column)"
        if isinstance(v, (list, np.ndarray, dict, set, bytearray)):
            return f"unhashable {type(v).__name__} cell (canonicalizer crash)"
        if isinstance(v, (_dt.date, _dt.datetime)):
            return None
        if not isinstance(v, (str, bytes)):
            return f"non-string object cell: {type(v).__name__}"
        return None  # first real cell is a string -> column is fine
    return None


def _frame_problems(df: pd.DataFrame, side: str) -> list[str]:
    out = []
    for c in df.columns:
        if _kind(df[c]) == "object":
            prob = _object_cell_problem(df[c])
            if prob:
                out.append(f"{side}.{c}: {prob}")
    return out


def lint_query(spark, con, name, fn, oracle_sql, sf_dir):
    problems = []
    sdf = fn(spark, sf_dir)
    spd = sdf.toPandas()
    problems += _frame_problems(spd, "spark")
    if oracle_sql is None:
        return problems, "rows-only"
    odf = con.sql(oracle_sql).df()
    problems += _frame_problems(odf, "oracle")
    s_cols, o_cols = sorted(spd.columns), sorted(odf.columns)
    if s_cols != o_cols:
        problems.append(f"column mismatch: spark={s_cols} oracle={o_cols}")
        return problems, "checked"
    for c in s_cols:
        ks, ko = _kind(spd[c]), _kind(odf[c])
        # All-NULL or nullable-int columns surface as float64/object on one
        # side; only flag when both sides have data and still disagree.
        if ks != ko and len(spd) and len(odf):
            problems.append(
                f"dtype kind mismatch on '{c}': spark={spd[c].dtype}({ks}) "
                f"oracle={odf[c].dtype}({ko})"
                + (" [HUGEINT trap: CAST(SUM(...) AS BIGINT) in the oracle]"
                   if {ks, ko} == {"int", "float"} else "")
            )
    return problems, "checked"


def main():
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1 and os.path.isdir(sys.argv[1])
        else "/root/testdata/sf0.001"
    )
    only = [a for a in sys.argv[1:] if not os.path.isdir(a)]
    spark = get_spark(
        "hash-lint", master=os.environ.get("SPARK_GRAFT_MASTER", "local[8]")
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = only or list(queries)
    failures = {}
    import time

    for name in names:
        t0 = time.time()
        try:
            problems, mode = lint_query(
                spark, con, name, queries[name], oracles.get(name), sf_dir
            )
        except Exception as e:  # noqa: BLE001
            problems, mode = [f"lint crashed: {type(e).__name__}: {e}"], "error"
        dt = time.time() - t0
        if problems:
            failures[name] = problems
            print(f"FAIL {name} [{dt:.1f}s]")
            for p in problems:
                print(f"     - {p}")
        else:
            print(f"ok   {name} ({mode}) [{dt:.1f}s]")
    print(f"\n{len(names) - len(failures)}/{len(names)} clean")
    if failures:
        print("violations:", sorted(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
