#!/usr/bin/env python3
"""Volume probe for the q96+ analytics shapes: synthetic 5M-event /
200k-user frame (no testdata dependency), timing gap-fill+LOCF,
transition counts, trailing RANGE aggregation, the funnel-stage
chain, and the weighted sampler at 1M docs. Prints one JSON line.

The point is shape validation beyond sf0.1: every op here must stay
within single-digit seconds on local[32] because nothing in any plan
is corpus-global — all windows are key-partitioned, the sampler is
map-only, the funnel is exchange-reusing equi-joins.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from product_etl_spark.operators import sampling as SA
from product_etl_spark.operators import timeseries as TS
from product_etl_spark.session import get_spark

N_EVENTS = 5_000_000
N_USERS = 200_000
N_DOCS = 1_000_000


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bench-analytics", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    types = ["click", "view", "purchase", "signup", "error"]
    ev = (
        spark.range(N_EVENTS)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(
                # hashed, not linear-congruential: an affine ts makes
                # every user's event ORDER identical, collapsing the
                # transition matrix to a handful of cells
                F.lit(1704067200) + F.abs(F.xxhash64("id")) % 7776000
            ).alias("ts"),
            (F.col("id") % N_USERS).alias("user_id"),
            F.element_at(
                F.array(*[F.lit(x) for x in types]),
                # type cycles over each user's successive events
                # (id % N_USERS alone would pin one type per user when
                # the stride divides 5 — funnel would find no one)
                (F.floor(F.col("id") / N_USERS) % 5 + 1).cast("int"),
            ).alias("event_type"),
            ((F.col("id") * 131071 % 10000) / 100.0).alias("value"),
        )
        .cache()
    )
    ev.count()
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}

    def t(name, df):
        t0 = time.time()
        rows[name] = df.count()
        timings[name] = round(time.time() - t0, 2)

    daily = (
        ev.filter("event_type='purchase'")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).alias("day_value"))
    )
    t("gapfill_locf", TS.gapfill_locf(daily, "user_id", "day", "day_value"))
    t(
        "transition_counts",
        TS.transition_counts(ev, "user_id", "event_type", ["ts", "event_id"]),
    )
    t(
        "trailing_range_agg",
        TS.trailing_range_agg(
            ev.filter("event_type='purchase'"),
            "user_id",
            "ts",
            F.col("value").cast("decimal(18,4)"),
            7 * 24 * 3600 * 1_000_000,
        ),
    )
    s = ev.filter("event_type='signup'").groupBy("user_id").agg(F.min("ts").alias("t0"))
    v = (
        ev.filter("event_type='view'")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        ev.filter("event_type='purchase'")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t("funnel_stage3", p)
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"), (F.col("id") % 5000 + 50).alias("n_chars")
    )
    t("weighted_sample", SA.weighted_sample(docs, "doc_id", "n_chars", 1, 5))
    print(
        json.dumps(
            {
                "metric": "analytics_total_sec",
                "value": round(sum(timings.values()), 2),
                "unit": "sec",
                "n_events": N_EVENTS,
                "n_users": N_USERS,
                "timings": timings,
                "rows": rows,
                "weighted_kept_frac": round(rows["weighted_sample"] / N_DOCS, 4),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
