#!/usr/bin/env python3
"""Global-rank A/B: `linkage.global_sort_ranks` (range partition +
parallel per-partition windows + offset map) vs the naive
``row_number() OVER (ORDER BY ...)`` global window, which Spark plans
as a SINGLE-partition window — every row through one task, the
100 TB cliff the q181/q184 entries exist to avoid.

Builds an N-row frame (md5-shuffled sort keys so range sampling sees
uniform data), runs both shapes, asserts the rank assignments are
IDENTICAL row-for-row, and prints wall seconds plus the partition
count each shape's window stage actually used (1 for the naive form —
read straight from the physical plan).

At local[32] the wall gap understates the cliff (one fat task still
finishes; on a cluster it also caps at one executor core and spills),
so the printed evidence is both the timing AND the structural
single-partition marker. Results summarized in SCALING.md.

Env: GR_N (default 2_000_000), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from product_etl_spark.operators.linkage import global_sort_ranks
from product_etl_spark.session import get_spark


def main() -> None:
    n = int(os.environ.get("GR_N", "2000000"))
    spark = get_spark("bench-global-ranks")
    spark.sparkContext.setLogLevel("ERROR")

    df = (
        spark.range(n)
        .select(
            F.col("id").alias("rid"),
            F.md5(F.col("id").cast("string")).alias("sk"),
        )
        .repartition(32)
        .persist()
    )
    df.count()

    t0 = time.monotonic()
    scalable = global_sort_ranks(df, ["sk", "rid"], rank_col="rank")
    s_sum = scalable.agg(F.sum("rank")).collect()[0][0]
    t_scalable = time.monotonic() - t0

    w = Window.orderBy("sk", "rid")
    naive = df.withColumn("rank", F.row_number().over(w))
    plan = naive._jdf.queryExecution().executedPlan().toString()
    single = "SinglePartition" in plan
    t0 = time.monotonic()
    n_sum = naive.agg(F.sum("rank")).collect()[0][0]
    t_naive = time.monotonic() - t0

    expect = n * (n + 1) // 2
    assert s_sum == n_sum == expect, (s_sum, n_sum, expect)
    # row-for-row equality on a sample join (full join at small N)
    if n <= 4_000_000:
        diff = (
            scalable.alias("a")
            .join(naive.alias("b"), ["rid"])
            .filter(F.col("a.rank") != F.col("b.rank"))
            .count()
        )
        assert diff == 0, f"{diff} rank mismatches"

    print(
        f"N={n}: global_sort_ranks {t_scalable:.2f}s (parallel windows) "
        f"vs naive global window {t_naive:.2f}s "
        f"(SinglePartition in plan: {single})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
