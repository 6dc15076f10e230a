#!/usr/bin/env python3
"""Skew benchmark for exact-substring segment dedup.

The adversarial input for segment dedup is a *boilerplate* segment
(cookie banner, license header) present in nearly every document: a
fingerprint-partitioned window would funnel all its occurrences to
one task, while the min-struct aggregation in
``remove_duplicate_segments`` collapses them map-side. This bench
plants exactly that: N docs, each carrying the same ``HOT_SEGS``
boilerplate segments plus unique filler, then measures wall time and
verifies the boilerplate survives exactly once corpus-wide.

Prints one JSON line: docs/sec, dup_ratio observed, hot-key checks.

Env: BENCH_SEGDEDUP_DOCS (default 100000),
     BENCH_SEGDEDUP_HOT_SEGS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from product_etl_spark.operators.dedup import (  # noqa: E402
    exploded_segments,
    remove_duplicate_segments,
)
from product_etl_spark.session import get_spark  # noqa: E402

SEG_WORDS = 8


def main() -> None:
    n_docs = int(os.environ.get("BENCH_SEGDEDUP_DOCS", "100000"))
    hot_segs = int(os.environ.get("BENCH_SEGDEDUP_HOT_SEGS", "3"))

    spark = get_spark("bench-segdedup")
    spark.sparkContext.setLogLevel("ERROR")

    # Boilerplate: hot_segs aligned 8-word segments shared by EVERY doc,
    # followed by 4 unique segments of per-doc filler. Generated
    # distributed (no driver-side corpus materialization).
    boiler = " ".join(
        f"boiler{s}w{w}" for s in range(hot_segs) for w in range(SEG_WORDS)
    )
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit(boiler),
            *[
                F.concat(F.lit(f"u{w}d"), F.col("id").cast("string"))
                for w in range(4 * SEG_WORDS)
            ],
        ).alias("text"),
    )

    t0 = time.monotonic()
    res = remove_duplicate_segments(docs, "text", "doc_id", seg_words=SEG_WORDS)
    stats = res.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_segments_kept").alias("kept"),
        F.sum("n_segments").alias("total"),
    ).collect()[0]
    wall = time.monotonic() - t0

    # hot-key correctness: each boilerplate segment survives exactly once
    segs = exploded_segments(
        res.select("doc_id", F.col("text")), "text", "doc_id", SEG_WORDS
    )
    hot_counts = (
        segs.filter(F.col("segment").startswith("boiler"))
        .groupBy("segment")
        .count()
        .collect()
    )
    hot_ok = len(hot_counts) == hot_segs and all(r["count"] == 1 for r in hot_counts)

    expected_total = n_docs * (hot_segs + 4)
    print(
        json.dumps(
            {
                "metric": "segdedup_docs_per_sec",
                "value": round(n_docs / wall, 1),
                "unit": "docs/sec",
                "wall_sec": round(wall, 2),
                "docs": int(stats["docs"]),
                "segments_total": int(stats["total"]),
                "segments_kept": int(stats["kept"]),
                "expected_total": expected_total,
                "hot_segment_survives_once": hot_ok,
                "hot_segs": hot_segs,
            }
        )
    )
    if not hot_ok or int(stats["total"]) != expected_total:
        sys.exit(1)


if __name__ == "__main__":
    main()
