#!/usr/bin/env python
"""Oracle parity pre-flight: run every registered query on Spark AND its
DuckDB oracle twin, compare like the driver will (SURVEY.md §5.4.2).

Usage:
    python tools/preflight.py [--sf-dir /root/testdata/sf0.01] [keys...]

Exit code 1 if any key fails. Keys without oracle SQL are run rows-only.
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback

sys.path.insert(0, ".")

import sparkgraft
from sparkgraft.oracle import compare_frames, duckdb_connect


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="*", help="subset of query keys (default: all)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = sparkgraft.get_session("preflight")
    con = duckdb_connect(args.sf_dir)

    keys = args.keys or sorted(sparkgraft.QUERIES)
    unknown = [k for k in keys if k not in sparkgraft.QUERIES]
    if unknown:
        print(f"unknown keys: {unknown}", file=sys.stderr)
        return 2

    n_fail = 0
    for key in keys:
        t0 = time.monotonic()
        try:
            spark_pdf = sparkgraft.QUERIES[key](spark, args.sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {key}: spark query raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        elapsed = time.monotonic() - t0
        oracle = sparkgraft.ORACLE.get(key)
        if oracle is None:
            print(f"ok    {key}: rows-only ({len(spark_pdf)} rows, {elapsed:.2f}s)")
            continue
        try:
            oracle_pdf = con.execute(oracle).fetchdf()
        except Exception:
            print(f"FAIL  {key}: oracle SQL raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        problems = compare_frames(spark_pdf, oracle_pdf)
        if problems:
            print(f"FAIL  {key}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {key} ({len(spark_pdf)} rows, {elapsed:.2f}s)")

    print(f"\n{len(keys) - n_fail}/{len(keys)} passed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
