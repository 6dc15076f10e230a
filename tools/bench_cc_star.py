#!/usr/bin/env python3
"""Connected-components A/B: min-label propagation vs large-star/
small-star contraction (dedup.connected_components algorithms) on

1. the q156-shaped REAL edge set (exact-Jaccard PPJoin pairs over the
   sf documents slice) — shallow near-dup clusters, propagation's
   home turf;
2. a planted LONG-CHAIN graph (path of N nodes) — diameter N, the
   propagation worst case (needs N rounds; star needs O(log N));
3. a planted HUB graph (one center wired to N spokes plus a pendant
   chain) — the skew case star's neighborhood-minimum rewiring
   bounds.

Prints per-graph wall seconds and rounds-to-converge for both
algorithms, and asserts the labelings are identical (the same
equality contract tests/test_dedup_similarity.py pins on the small
fixtures). Results summarized in SCALING.md §connected-components.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
CC_CHAIN_N (default 200), CC_HUB_N (default 5000). The chain default
is small on purpose: propagation must run CHAIN_N rounds to converge
(one hop of min-label travel per round, one Spark job each), which is
precisely the pathology the A/B demonstrates — star does the same
graph in ~log2(N) rounds.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from product_etl_spark import plans  # noqa: F401,E402  (catalog import parity)
from product_etl_spark.operators.dedup import (  # noqa: E402
    connected_components,
    set_similarity_pairs,
)
from product_etl_spark.session import get_spark, load_tables  # noqa: E402


def _ab(spark, name, pairs, max_iter):
    pairs = pairs.localCheckpoint(eager=True)
    out = {}
    for algo in ("propagation", "star"):
        t0 = time.perf_counter()
        labels = connected_components(
            pairs, algorithm=algo, max_iter=max_iter
        )
        rows = sorted(map(tuple, labels.collect()))
        out[algo] = (time.perf_counter() - t0, rows)
    (tp, rp), (ts, rs) = out["propagation"], out["star"]
    match = rp == rs
    print(
        f"{name:18s} propagation {tp:6.2f}s | star {ts:6.2f}s | "
        f"labels {'MATCH' if match else 'DIVERGE'} "
        f"({len(rp)} nodes)"
    )
    if not match:
        raise SystemExit(f"{name}: star != propagation")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    chain_n = int(os.environ.get("CC_CHAIN_N", "200"))
    hub_n = int(os.environ.get("CC_HUB_N", "5000"))
    spark = get_spark("cc-ab")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_tables(spark, sf_dir, ["documents"])["documents"].filter(
        F.col("doc_id") < 300
    )
    real = set_similarity_pairs(docs, "text", "doc_id", 3, 5).select(
        "id_a", "id_b"
    )
    _ab(spark, "near-dup (q156)", real, max_iter=25)

    chain = spark.range(chain_n).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    # propagation moves the min label one hop per round: the chain
    # needs chain_n rounds (one Spark job each); star needs ~log2
    _ab(spark, f"chain n={chain_n}", chain, max_iter=chain_n + 10)

    hub = (
        spark.range(1, hub_n)
        .select(F.lit(0).alias("id_a"), F.col("id").alias("id_b"))
        .unionByName(
            spark.range(hub_n, hub_n + 20).select(
                (F.col("id") - 1).alias("id_a"), F.col("id").alias("id_b")
            )
        )
    )
    _ab(spark, f"hub n={hub_n}", hub, max_iter=40)
    spark.stop()


if __name__ == "__main__":
    main()
