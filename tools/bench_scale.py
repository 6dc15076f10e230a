#!/usr/bin/env python3
"""Empirical scaling probe: wall time of representative catalog
queries at sf0.001 / sf0.01 / sf0.1 (10x data per step).

The point is the RATIO between steps: a plan that survives a 100x
scale-up shows time growing at most ~linearly with data once the
fixed per-query overhead (~0.1-0.3 s of planning + task dispatch)
stops dominating. Prints one JSON line: per-query times per SF and
the 0.01 -> 0.1 growth factor (10x data; <=10 means at-most-linear).

Representative set: scan-agg (q01), broadcast join chain (q73),
shuffle-heavy LSH band join (q32), window sessionization (q24),
curation chain (q94), decontamination (q112), LM scoring (q113).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from product_etl_spark.plans import CATALOG  # noqa: E402
from product_etl_spark.session import get_spark  # noqa: E402

QUERIES = [
    "q01_pricing_summary",
    "q73_tpch_q5_local_supplier_volume",
    "q32_lsh_near_dup_pairs",
    "q24_sessionization",
    "q94_corpus_curation",
    "q112_benchmark_decontam",
    "q113_bigram_lm_perplexity",
]
SFS = ["sf0.001", "sf0.01", "sf0.1"]


def main() -> None:
    spark = get_spark("bench-scale")
    base = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
    out: dict[str, dict[str, float]] = {}
    for name in QUERIES:
        fn = CATALOG[name]["fn"]
        per = {}
        for sf in SFS:
            sf_dir = f"{base}/{sf}"
            fn(spark, sf_dir).count()  # warm (plan + page cache)
            t0 = time.time()
            fn(spark, sf_dir).count()
            per[sf] = round(time.time() - t0, 3)
        per["growth_10x"] = round(per["sf0.1"] / max(per["sf0.01"], 1e-9), 2)
        out[name] = per
    print(json.dumps({"metric": "scaling_probe", "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
