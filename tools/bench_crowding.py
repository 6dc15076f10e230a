#!/usr/bin/env python3
"""Bench-session crowding A/B: re-measure the N most expensive
catalog queries (by BENCH_DETAIL.json) in a BARE session — fresh
SparkContext, only these queries — under the exact warmup/reps/median
protocol bench.py uses, and print per-query bare-vs-full-catalog
ratios plus the aggregate crowding coefficient
(sum(full) / sum(bare)).

Rationale: r6 and r7 each showed ~20% broad-based drift on untouched
plans as the catalog grew; if the bare re-measure comes in
systematically below the full-catalog numbers, the drift is
session-age crowding (accumulated listener state, codegen cache,
broadcast cleanup backlog), not plan regressions. The coefficient is
recorded in SCALING.md and re-checked when it matters.

Env: SPARK_GRAFT_SF_DIR, BENCH_CROWD_TOP (default 10),
SPARK_GRAFT_BENCH_REPS / _WARMUP (same defaults as bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from product_etl_spark import plans  # noqa: E402
from product_etl_spark.session import get_spark, load_tables  # noqa: E402


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    top_n = int(os.environ.get("BENCH_CROWD_TOP", "10"))
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    warmup = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1")))

    with open(os.path.join(repo, "BENCH_DETAIL.json")) as f:
        detail = json.load(f)
    full = detail["queries"]
    names = sorted(full, key=full.get, reverse=True)[:top_n]

    spark = get_spark("bench-crowding")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for df in load_tables(spark, sf_dir).values():
        df.limit(1).collect()

    bare: dict[str, float] = {}
    for name in names:
        fn = plans.CATALOG[name]["fn"]
        for _ in range(warmup):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(reps):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.monotonic() - t0)
        bare[name] = round(sorted(runs)[len(runs) // 2], 3)

    ratios = {n: round(full[n] / bare[n], 2) for n in names}
    print(
        json.dumps(
            {
                "metric": "crowding_coefficient",
                "value": round(
                    sum(full[n] for n in names) / sum(bare.values()), 3
                ),
                "unit": "x (full-catalog wall / bare-session wall)",
                "sf": detail.get("sf"),
                "full_catalog": {n: full[n] for n in names},
                "bare_session": bare,
                "ratio": ratios,
            },
            indent=1,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
