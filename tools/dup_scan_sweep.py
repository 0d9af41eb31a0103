"""Duplicate-subtree sweep (guide §1.2): flag queries that re-execute the
same parquet scan many times in one plan.

A DataFrame consumed N times without an eager localCheckpoint re-runs its
whole lineage per consumer; column pruning then specializes each copy so
Spark's ReuseExchange cannot canonicalize them away (that is exactly how
triangle_count_copurchase ended up scanning lineitem 12x). Self-joins
legitimately scan a table twice, so the report threshold is >= 3
executions of ONE location inside ONE executed plan.

For every registry query (same execution discipline as plan_audit: build,
collect at the fixture SF, read the FINAL AdaptiveSparkPlan; streaming
queries audit the harvested last-micro-batch plan):
  - count `FileScan parquet` occurrences per Location,
  - report queries where any single location appears >= --threshold times.

Usage: python tools/dup_scan_sweep.py [sf_dir] [--threshold N] [--queries a,b]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql_data_anonymizer_spark.session import get_spark  # noqa: E402


def scan_counts(plan: str) -> Counter:
    if "== Final Plan ==" in plan:
        plan = plan.split("== Initial Plan ==")[0]
    c: Counter = Counter()
    for m in re.finditer(r"FileScan parquet[^\n]*?Location[^\[]*\[([^\]]*)\]", plan):
        c[m.group(1).rsplit("/", 1)[-1]] += 1
    if not c:
        # executedPlan().toString() prints Location on the FileScan line in
        # some formats and a separate "Location:" line in others
        locs = re.findall(r"FileScan parquet", plan)
        files = re.findall(r"InMemoryFileIndex(?:\(\d+ paths\))?\[([^\],]*)", plan)
        for f in files[: len(locs)]:
            c[f.rsplit("/", 1)[-1]] += 1
        if not files and locs:
            c["<unlocated>"] = len(locs)
    return c


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--threshold", type=int, default=3)
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()
    if not os.path.exists(os.path.join(args.sf_dir, "lineitem.parquet")):
        ap.error(f"{args.sf_dir!r} is not a fixture directory")

    spark = get_spark("dup-scan-sweep", master="local[4]")
    import mysql_data_anonymizer_spark.queries as Q

    names = args.queries.split(",") if args.queries else list(Q.QUERIES)
    flagged, errors = [], []
    for name in names:
        try:
            df = Q.QUERIES[name](spark, args.sf_dir)
            plan = getattr(spark, "_mda_stream_plans", {}).get(name)
            if plan is None:
                df.collect()
                plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
            counts = scan_counts(plan)
            hot = {k: v for k, v in counts.items() if v >= args.threshold}
            if hot:
                flagged.append((name, hot, sum(counts.values())))
                print(f"FLAG {name}: {hot} (total file scans {sum(counts.values())})")
        except Exception as exc:  # noqa: BLE001
            errors.append((name, str(exc)[:100]))
            print(f"ERROR {name}: {str(exc)[:100]}")
    print(
        f"\nswept {len(names)} queries: {len(flagged)} flagged "
        f"(>= {args.threshold}x one location), {len(errors)} errors"
    )


if __name__ == "__main__":
    main()
