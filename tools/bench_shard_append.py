#!/usr/bin/env python3
"""Volume probe for the INCREMENTAL balanced-shard rung
(operators/sampling.append_balanced_shards): 10 arriving batches of
200k sized documents (2M total) dealt one-by-one into 64 growing
shard manifests. The incremental CONTRACT at volume: per-batch cost
is ONE two-level global rank over the BATCH plus an n_shards-row
state fold — history manifests are never re-read, so the per-batch
wall stays FLAT while the cumulative manifest grows 10x. Asserts the
balance bound after EVERY append (max-min shard-total spread <= 2x
the largest single weight seen so far). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from product_etl_spark.operators.sampling import (
    append_balanced_shards,
    shard_weight_totals,
)
from product_etl_spark.session import get_spark

N_BATCHES = 10
BATCH_DOCS = 200_000
N_SHARDS = 64
MAX_W = 2048


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bench-shard-append",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    state = None
    walls = []
    for k in range(N_BATCHES):
        batch = (
            spark.range(k * BATCH_DOCS, (k + 1) * BATCH_DOCS)
            .select(
                F.col("id").alias("doc_id"),
                (F.pmod(F.xxhash64(F.col("id")), F.lit(MAX_W)) + 1).alias(
                    "n_tokens"
                ),
            )
            .localCheckpoint(eager=True)
        )
        t0 = time.time()
        assigned = append_balanced_shards(
            batch, "n_tokens", "doc_id", N_SHARDS, state
        )
        part = shard_weight_totals(assigned, "n_tokens")
        state = (
            part
            if state is None
            else state.unionByName(part)
            .groupBy("shard")
            .agg(F.sum("total_weight").alias("total_weight"))
        ).localCheckpoint(eager=True)
        walls.append(round(time.time() - t0, 2))
        totals = {r["shard"]: r["total_weight"] for r in state.collect()}
        vals = [totals.get(s, 0.0) for s in range(N_SHARDS)]
        spread = max(vals) - min(vals)
        assert spread <= 2 * MAX_W, (k, spread)

    out = {
        "batches": N_BATCHES,
        "docs_per_batch": BATCH_DOCS,
        "n_shards": N_SHARDS,
        "per_batch_sec": walls,
        "first_batch_sec": walls[0],
        "last_batch_sec": walls[-1],
        # flat-cost contract: the 10th append (manifest 10x larger)
        # must not cost materially more than the 2nd (the 1st pays
        # JVM/codegen warmup)
        "flat": walls[-1] <= 2.0 * max(walls[1], 0.5),
        "final_spread": round(spread, 1),
        "spread_bound": 2 * MAX_W,
    }
    assert out["flat"], out
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
