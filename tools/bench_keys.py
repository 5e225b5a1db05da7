#!/usr/bin/env python
"""Time a subset of registry keys with the bench's own methodology
(one untimed warmup, then min-of-N warm ``toPandas`` runs) so a single
key's before/after can be measured without a full bench sweep.

Usage:
    python tools/bench_keys.py [--sf-dir /root/testdata/sf0.1]
                               [--reps 3] key [key ...]

Prints one line per key: min / all runs. Same session config as bench.py
(shared ``sparkgraft.get_session``), so numbers are comparable to
BENCH_trace.json entries taken on a quiet host.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sparkgraft


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--plans-dir",
        default=None,
        help="also write each key's explain('formatted') to "
        "<plans-dir>/<key>_<suffix>.txt",
    )
    ap.add_argument("--plan-suffix", default="before")
    args = ap.parse_args()

    unknown = [k for k in args.keys if k not in sparkgraft.QUERIES]
    if unknown:
        print(f"unknown keys: {unknown}", file=sys.stderr)
        return 2

    spark = sparkgraft.get_session("sparkgraft-bench-keys")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"# sf_dir={args.sf_dir} loadavg={os.getloadavg()[0]:.2f}")
    for key in args.keys:
        fn = sparkgraft.QUERIES[key]
        spark.sparkContext.setJobDescription(f"warmup:{key}")
        df = fn(spark, args.sf_dir)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(
                    args.plans_dir, f"{key}_{args.plan_suffix}.txt"
                ),
                "w",
            ) as fh:
                fh.write(plan)
        df.toPandas()  # warmup
        runs = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"timed:{key}:{i}")
            t0 = time.monotonic()
            fn(spark, args.sf_dir).toPandas()
            runs.append(round(time.monotonic() - t0, 4))
        print(f"{min(runs):8.3f}  {key}  runs={runs}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
