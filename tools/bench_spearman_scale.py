#!/usr/bin/env python3
"""Volume probe for the scale-hardened grouped Spearman
(operators/profile.spearman_corr, r13 verdict item 2): TWO groups x
2.5M rows each (5M observations, ~2M distinct values per side) — the
exact few-group/high-cardinality shape where the old per-group
cumulative window collapsed to one task per group. The segmented
two-level prefix sum spreads each group's midrank scan across every
partition; this drive measures the wall and pins rho EXACTLY (to the
ROUND 6 surface) against a pandas rank-Pearson replay of all 5M
rows. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from product_etl_spark.operators.profile import spearman_corr
from product_etl_spark.session import get_spark

N_PER_GROUP = 2_500_000


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bench-spearman-scale",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic pseudo-random doubles with a monotone component,
    # so rho is far from 0 and ties exist but are rare (the
    # high-distinct-cardinality regime)
    df = (
        spark.range(2 * N_PER_GROUP)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit("A"))
            .otherwise(F.lit("B"))
            .alias("g"),
            (F.pmod(F.xxhash64(F.col("id")), F.lit(1_000_003)))
            .cast("double")
            .alias("x"),
            (
                F.pmod(F.xxhash64(F.col("id")), F.lit(1_000_003))
                + F.pmod(F.xxhash64(F.col("id") + 7), F.lit(500_009))
            )
            .cast("double")
            .alias("y"),
        )
        .localCheckpoint(eager=True)
    )
    n_rows = df.count()

    t0 = time.time()
    got = {
        r["g"]: (r["n"], r["rho"])
        for r in spearman_corr(df, "x", "y", "g").collect()
    }
    wall = round(time.time() - t0, 2)

    # exact replay: pandas rank-Pearson per group over ALL rows
    pdf = df.toPandas()
    exact = {}
    for g, sub in pdf.groupby("g"):
        exact[g] = (len(sub), round(sub["x"].rank().corr(sub["y"].rank()), 6))
    mismatch = {
        g: (got[g], exact[g])
        for g in exact
        if got[g][0] != exact[g][0] or abs(got[g][1] - exact[g][1]) > 2e-6
    }
    assert not mismatch, mismatch

    out = {
        "rows": n_rows,
        "groups": len(got),
        "distinct_x": df.select("x").distinct().count(),
        "sec": wall,
        "rows_per_sec": int(n_rows / wall),
        "rho": {g: got[g][1] for g in sorted(got)},
        "exact_vs_pandas": True,
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
