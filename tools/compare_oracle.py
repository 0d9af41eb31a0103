"""Dev harness: run each __spark_entry__ query against its DuckDB oracle and
compare row count, column names, and sorted values — a local approximation
of the driver's CORRECTNESS gate. Usage:

    python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from mysql_data_anonymizer_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # exact double repr — catches any bit difference
    try:  # Decimal
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{v:f}"
    except Exception:
        pass
    return str(v)


def df_to_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def compare_one(spark, con, fn, oracle_sql, name, sf_dir):
    """Run one query + its oracle and compare; returns (ok, message)."""
    t0 = time.time()
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = sdf.collect()
    if oracle_sql is None:
        return True, f"no oracle (rows-only), spark rows={len(srows)} [{time.time()-t0:.1f}s]"
    res = con.sql(oracle_sql)
    dcols = res.columns
    drows = res.fetchall()
    if sorted(scols) != sorted(dcols):
        return False, f"columns spark={sorted(scols)} duck={sorted(dcols)}"
    if len(srows) != len(drows):
        return False, f"rows spark={len(srows)} duck={len(drows)}"
    a = df_to_rows(scols, srows)
    b = df_to_rows(dcols, drows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"value mismatch; first diffs: {diffs}"
    return True, f"{len(srows)} rows [{time.time()-t0:.1f}s]"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if not os.path.isdir(a)]
    spark = get_spark("oracle-compare", master=os.environ.get("SPARK_GRAFT_MASTER", "local[8]"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = only or list(qs)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only), spark rows={len(srows)} [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.sql(oracles[name])
            dcols = res.columns
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        elif len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
            ok = False
        else:
            a = df_to_rows(scols, srows)
            b = df_to_rows(dcols, drows)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"FAIL {name}: value mismatch; first diffs: {diffs}")
                ok = False
        if ok:
            print(f"OK   {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
        else:
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} matched; failures: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
