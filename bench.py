#!/usr/bin/env python3
"""Benchmark harness: run the full query catalog at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Each query is forced with a noop write (full execution, no driver
collect overhead in the measurement), run WARMUP untimed times first
(default 1, $SPARK_GRAFT_BENCH_WARMUP — analysis/codegen compile is
a one-off driver cost, not per-run execution), then timed REPS times
(default 3, $SPARK_GRAFT_BENCH_REPS); the per-query number is the
MEDIAN — single runs on a shared box swing ±30% with machine load,
and the engine's steady-state cost is the signal. Reported value =
sum of per-query medians; the JSON carries reps/warmup/agg so runs
are comparable.

$SPARK_GRAFT_BENCH_ISOLATE=N (default 0 = off) restarts the
SparkSession (fresh SparkContext, cleared cache, re-warmed scans)
every N queries: two consecutive rounds showed ~20% broad-based
drift on UNTOUCHED query plans as the catalog grew (one session now
executes 155 queries x 4 runs — accumulated listener state, codegen
cache, and broadcast cleanup crowd later queries), and isolation
bounds that session-age effect so real plan regressions stay
measurable. The measured crowding coefficient lives in SCALING.md.

The artifact is SELF-EXPLAINING (r9 verdict item 1): BENCH_DETAIL.json
carries every query's per-rep times and its Spark job count, and the
stdout line carries a ``spread`` dict for any query whose rep spread
is anomalous (max > 1.5x min and > 0.5s apart). A 6x outlier with a
clean min and a fat max is box contention, not a plan regression —
now attributable from the artifact alone, no rerun needed.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from product_etl_spark import plans  # noqa: E402
from product_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "?"
    from product_etl_spark.session import load_tables

    def _fresh_session():
        # Measured: AQE adds no steady-state latency at this scale
        # (its stage re-optimization overlaps scheduling), so the
        # bench runs the same profile we'd ship to a cluster.
        s = get_spark("product_etl_spark-bench")
        s.sparkContext.setLogLevel("ERROR")
        # Warm up the JVM/codegen/scheduler so the first measured
        # query isn't charged session startup (we measure queries,
        # not boot), and pre-register all table scans.
        s.range(1_000_000).selectExpr("sum(id)").collect()
        for df in load_tables(s, sf_dir).values():
            df.limit(1).collect()
        return s

    spark = _fresh_session()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    warmup = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1")))
    isolate = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_ISOLATE", "0")))
    timings: dict[str, float] = {}
    rep_times: dict[str, list[float]] = {}
    job_counts: dict[str, int] = {}
    job_count_floors: list[str] = []  # hit the retainedJobs ceiling
    retained_jobs = int(spark.conf.get("spark.ui.retainedJobs", "1000"))
    for i, (name, spec) in enumerate(plans.CATALOG.items()):
        if isolate and i and i % isolate == 0:
            spark.stop()
            spark = _fresh_session()
        # Untimed warmup executions first: analysis + codegen compile
        # is a one-off driver cost, not the steady-state execution a
        # cluster pays per run — the measured reps see only execution.
        for _ in range(warmup):
            spec["fn"](spark, sf_dir).write.format("noop").mode("overwrite").save()
        sc = spark.sparkContext
        group = f"bench:{name}"
        sc.setJobGroup(group, name)
        runs = []
        try:
            for _ in range(reps):
                t0 = time.monotonic()
                df = spec["fn"](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                runs.append(time.monotonic() - t0)
        finally:
            sc.setJobGroup("", "")
        # jobs submitted by the measured reps (read immediately, while
        # the UI's retained-job window still holds them). The UI store
        # is bounded by spark.ui.retainedJobs (default 1000): a query
        # whose reps submit more jobs than the window silently
        # under-counts, so counts at/near the ceiling are flagged as
        # floors, not totals.
        try:
            job_counts[name] = len(sc.statusTracker().getJobIdsForGroup(group))
            if job_counts[name] >= retained_jobs - 10:
                job_count_floors.append(name)
        except Exception:
            job_counts[name] = -1
        rep_times[name] = [round(r, 3) for r in runs]
        timings[name] = round(sorted(runs)[len(runs) // 2], 3)

    total = round(sum(timings.values()), 3)
    meta = {
        "metric": "catalog_total_wall",
        "value": total,
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "reps": reps,
        "warmup": warmup,
        "agg": "median",
        "isolate": isolate,
    }
    # Full-precision, full-name per-query detail goes to a sidecar file;
    # stdout gets ONE compact line. The driver records only the LAST
    # 2000 bytes of stdout — the full 120-query dict with descriptive
    # names is ~3.5 KB, which truncated the front of the JSON line and
    # made BENCH_r{2..5}.json unparseable ("parsed": null). Short qNN
    # keys + 2-decimal values keep the line well under the window.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(
            {
                **meta,
                "queries": timings,
                "rep_times": rep_times,
                "job_counts": job_counts,
            },
            f,
            indent=1,
        )
    # Anomaly attribution in the tail line itself: [min, max] per-rep
    # spread for queries where the reps disagree badly. A clean min
    # with a fat max = external contention (the plan ran fast at least
    # once); uniformly slow reps = a real regression.
    spread = {
        n.split("_")[0]: [min(r), max(r)]
        for n, r in rep_times.items()
        if len(r) > 1 and max(r) > 1.5 * min(r) and max(r) - min(r) > 0.5
    }
    if spread:
        meta["spread"] = dict(
            sorted(spread.items(), key=lambda kv: -(kv[1][1] - kv[1][0]))[:10]
        )
    # jobs_total excludes failed reads (-1); say HOW MANY were excluded
    # and which counts are retained-window floors, so the artifact
    # never silently under-reports (ADVICE r10).
    meta["jobs_total"] = sum(v for v in job_counts.values() if v > 0)
    n_unread = sum(1 for v in job_counts.values() if v < 0)
    if n_unread:
        meta["job_count_read_failures"] = n_unread
    if job_count_floors:
        meta["job_count_floors"] = job_count_floors
    compact = {n.split("_")[0]: round(t, 2) for n, t in timings.items()}
    # Per-query Spark JOB counts for the most expensive queries, in
    # the stdout line itself (r15 verdict item 8, additions-only):
    # jobs are deterministic per plan, so a round-over-round diff can
    # separate plan changes from wall noise without BENCH_DETAIL.json.
    # Within the byte budget the jobs dict is dropped FIRST (cheapest
    # query's entry at a time) so the `queries` population is exactly
    # what it was before this field existed.
    jobs_compact = {
        n.split("_")[0]: job_counts[n]
        for n, _ in sorted(timings.items(), key=lambda kv: -kv[1])[:30]
        if job_counts.get(n, -1) >= 0
    }
    line = json.dumps(
        {**meta, "jobs": jobs_compact, "queries": compact},
        separators=(",", ":"),
    )
    while len(line) > 1900:  # belt-and-braces: drop cheapest queries
        dropped = min(compact, key=compact.get)
        compact.pop(dropped)
        jobs_compact.pop(dropped, None)  # keep jobs ⊆ printed queries
        meta["queries_omitted"] = len(timings) - len(compact)
        payload = {**meta, "queries": compact}
        if jobs_compact:
            payload["jobs"] = jobs_compact
        line = json.dumps(payload, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
