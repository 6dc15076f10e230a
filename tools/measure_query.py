#!/usr/bin/env python3
"""Isolated per-query measurement: noop-sink wall time, job count,
and optional formatted-plan capture for a NAMED subset of catalog
queries — the guide-§1 measure-first loop without paying for the
whole catalog.

Usage:
  python tools/measure_query.py q217 q212 ...            # timing only
  python tools/measure_query.py --explain plans/r15 q217 # + save plan
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 overrides the data dir;
  SPARK_GRAFT_BENCH_REPS / _WARMUP as in bench.py.

Query names may be prefixes (q217 matches q217_suffix_doubling_spans).
Prints one line per query: median / per-rep walls / job count, and a
final JSON line for scripting.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from product_etl_spark import plans  # noqa: E402
from product_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    explain_dir = None
    suffix = "_before"
    while args and args[0].startswith("--"):
        if args[0] == "--explain":
            explain_dir = args[1]
            args = args[2:]
        elif args[0] == "--suffix":
            suffix = args[1]
            args = args[2:]
        else:
            sys.exit(f"unknown flag {args[0]}")
    if not args:
        sys.exit(__doc__)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    warmup = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1")))

    selected = {}
    for pat in args:
        hits = [n for n in plans.CATALOG if n == pat or n.startswith(pat)]
        if not hits:
            sys.exit(f"no catalog entry matches {pat!r}")
        for h in hits:
            selected[h] = plans.CATALOG[h]

    spark = get_spark("measure-query")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    out = {}
    for name, spec in selected.items():
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = spec["fn"](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            short = name.split("_")[0]
            with open(
                os.path.join(explain_dir, f"{short}{suffix}.txt"), "w"
            ) as f:
                f.write(plan)
        for _ in range(warmup):
            spec["fn"](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        sc = spark.sparkContext
        group = f"measure:{name}"
        sc.setJobGroup(group, name)
        runs = []
        try:
            for _ in range(reps):
                t0 = time.monotonic()
                spec["fn"](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(round(time.monotonic() - t0, 3))
        finally:
            sc.setJobGroup("", "")
        try:
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        except Exception:
            jobs = -1
        med = sorted(runs)[len(runs) // 2]
        out[name] = {"median": med, "reps": runs, "jobs": jobs}
        print(f"{name}: median={med}s reps={runs} jobs={jobs}", flush=True)
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
