#!/usr/bin/env python3
"""Measure the incremental-rollup claim: folding a new batch into the
state table costs O(batch), while recompute-from-scratch grows with
accumulated history. Ten synthetic event batches; per step we time
(a) incremental_rollup of just the batch and (b) a full groupBy over
everything seen so far. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from product_etl_spark.operators.rollup import incremental_rollup
from product_etl_spark.session import get_spark

BATCH_ROWS = 200_000
N_BATCHES = 10


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bench-rollup", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="bench_rollup_")
    state = f"{root}/state"
    hist = f"{root}/history"
    measures = {
        "n": F.lit(1).cast("bigint"),
        "total": (F.col("v") % 1000).cast("decimal(18,2)"),
    }
    inc_times, full_times = [], []
    try:
        for b in range(N_BATCHES):
            batch = (
                spark.range(b * BATCH_ROWS, (b + 1) * BATCH_ROWS)
                .select(
                    (F.col("id") % 500).alias("k"),
                    (F.col("id") * 2654435761 % 2**31).alias("v"),
                )
            )
            batch.write.mode("append").parquet(hist)
            t0 = time.time()
            incremental_rollup(spark, batch, state, ["k"], measures)
            inc_times.append(time.time() - t0)
            t0 = time.time()
            (
                spark.read.parquet(hist)
                .groupBy("k")
                .agg(*[F.sum(e).alias(n) for n, e in measures.items()])
                .write.mode("overwrite")
                .parquet(f"{root}/full")
            )
            full_times.append(time.time() - t0)
        print(
            json.dumps(
                {
                    "metric": "rollup_fold_sec_last_batch",
                    "value": round(inc_times[-1], 3),
                    "unit": "sec",
                    "batch_rows": BATCH_ROWS,
                    "n_batches": N_BATCHES,
                    "incremental_sec": [round(t, 3) for t in inc_times],
                    "recompute_sec": [round(t, 3) for t in full_times],
                    "incremental_flat": inc_times[-1] < 2 * inc_times[1],
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
