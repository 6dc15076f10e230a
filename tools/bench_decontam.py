#!/usr/bin/env python3
"""Throughput benchmark for the round-4 curation operators on a
synthetic corpus: benchmark decontamination and incremental
cross-batch dedup.

Decontamination: N docs (~60 words), a B-doc benchmark set, a known
fraction of corpus docs containing verbatim benchmark spans. Reports
docs/sec end-to-end plus flag recall/precision against the planted
truth.

Incremental dedup: the same corpus split into two batches with a
planted cross-batch duplicate fraction; reports batch-2 docs/sec
(the steady-state cost: sketch + store join) and cross-batch recall.

Env: BENCH_DECON_DOCS (default 100000), BENCH_DECON_BENCH (1000),
BENCH_DECON_CONTAM_FRAC (0.05).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from product_etl_spark.operators import decontam as DC  # noqa: E402
from product_etl_spark.operators.dedup_incremental import (  # noqa: E402
    incremental_dedup,
)
from product_etl_spark.session import get_spark  # noqa: E402


def _text(prefix_col, n_words: int = 60):
    return F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit("w"),
                ((F.xxhash64(prefix_col, F.lit(i)) % 1000 + 1000) % 1000)
                .cast("string"),
            )
            for i in range(n_words)
        ],
    )


def main() -> None:
    n_docs = int(os.environ.get("BENCH_DECON_DOCS", "100000"))
    n_bench = int(os.environ.get("BENCH_DECON_BENCH", "1000"))
    contam_frac = float(os.environ.get("BENCH_DECON_CONTAM_FRAC", "0.05"))
    spark = get_spark("bench-decontam")

    bench = spark.range(n_bench).select(
        F.col("id").alias("doc_id"),
        _text(F.col("id") + 10_000_000).alias("text"),
    )
    n_contam = int(n_docs * contam_frac)
    clean = spark.range(n_docs - n_contam).select(
        (F.col("id") + n_bench).alias("doc_id"),
        _text(F.col("id")).alias("text"),
    )
    # contaminated docs: 30 fresh words + a 30-word verbatim span of a
    # benchmark doc (well above the 10% 5-gram overlap threshold)
    contam = spark.range(n_contam).select(
        (F.col("id") + n_bench + n_docs).alias("doc_id"),
        F.concat_ws(
            " ",
            _text(F.col("id") + 20_000_000, 30),
            F.substring(
                _text((F.col("id") % n_bench) + 10_000_000), 1, 30 * 5
            ),
        ).alias("text"),
    )
    corpus = clean.unionByName(contam)

    t0 = time.time()
    grams = DC.benchmark_ngrams(bench, "text", "doc_id", n=5)
    scores = DC.contamination_scores(corpus, grams, "text", "doc_id", n=5)
    agg = scores.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("contaminated").alias("n_flagged"),
        F.sum(
            F.when(
                (F.col("contaminated") == 1)
                & (F.col("doc_id") >= n_bench + n_docs),
                1,
            ).otherwise(0)
        ).alias("true_pos"),
    ).first()
    dt = time.time() - t0
    recall = agg["true_pos"] / max(1, n_contam)
    precision = agg["true_pos"] / max(1, agg["n_flagged"])

    # incremental dedup steady state: batch2 vs a warmed store
    store = tempfile.mkdtemp() + "/sigs"
    half = n_docs // 2
    b1 = corpus.filter(F.col("doc_id") < n_bench + half)
    b2_fresh = corpus.filter(F.col("doc_id") >= n_bench + half)
    # plant cross-batch dups: re-send 5% of batch1 under new ids
    resend = b1.limit(int(half * 0.05)).select(
        (F.col("doc_id") + 50_000_000).alias("doc_id"), "text"
    )
    b2 = b2_fresh.unionByName(resend)
    incremental_dedup(spark, b1, "text", "doc_id", store,
                      strategy="fingerprint")
    n_b2 = b2.count()
    t1 = time.time()
    survivors = incremental_dedup(spark, b2, "text", "doc_id", store,
                                  strategy="fingerprint")
    n_kept = survivors.count()
    dt2 = time.time() - t1
    n_resent = int(half * 0.05)
    cross_caught = n_b2 - n_kept

    print(json.dumps({
        "metric": "decontam_docs_per_s",
        "value": round((n_docs + n_bench) / dt, 1),
        "unit": "docs/s",
        "n_docs": n_docs,
        "n_benchmark": n_bench,
        "flag_recall": round(recall, 4),
        "flag_precision": round(precision, 4),
        "incremental_dedup_docs_per_s": round(n_b2 / dt2, 1),
        "cross_batch_planted": n_resent,
        "cross_batch_caught": cross_caught,
    }))
    shutil.rmtree(os.path.dirname(store), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
