#!/usr/bin/env python3
"""Near-dup dedup benchmark + recall check on a synthetic corpus.

Generates N documents (~60 words each from a power-law vocabulary),
plants a known fraction of near-duplicates (a few words perturbed),
runs the full pipeline (minhash -> banded LSH -> exact Jaccard ->
drop), and reports one JSON line: docs/sec end-to-end plus recall /
precision against the planted truth.

Env: BENCH_DEDUP_DOCS (default 100000), BENCH_DEDUP_DUP_FRAC (0.1).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from product_etl_spark.operators import dedup as D  # noqa: E402
from product_etl_spark.session import get_spark  # noqa: E402

VOCAB = [f"w{i}" for i in range(2000)]


def _word(seed: str, i: int) -> str:
    h = int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16)
    # power-law-ish: bias toward low ids
    return VOCAB[(h % 45) if h % 3 else (h % 2000)]


def synthesize(spark, n_docs: int, dup_frac: float):
    n_base = int(n_docs * (1 - dup_frac))
    base = spark.range(n_base).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", *[F.concat(F.lit(f"w"), ((F.xxhash64(F.col("id"), F.lit(i)) % 1000 + 1000) % 1000)) for i in range(60)]
        ).alias("text"),
    )
    # planted near-dups: copy of doc (id - n_base) with 3 words changed
    n_dups = n_docs - n_base
    dups = spark.range(n_dups).select(
        (F.col("id") + n_base).alias("doc_id"),
        F.col("id").alias("src_id"),
    )
    src = base.select(
        F.col("doc_id").alias("src_id"), F.col("text").alias("src_text")
    )
    dup_docs = dups.join(src, "src_id").select(
        "doc_id",
        F.concat(
            F.lit("zq zx zz "),  # 3-word perturbation at the front
            F.expr("substring(src_text, 10)"),
        ).alias("text"),
    )
    return base.unionByName(dup_docs), n_base


def main() -> None:
    n_docs = int(os.environ.get("BENCH_DEDUP_DOCS", "100000"))
    dup_frac = float(os.environ.get("BENCH_DEDUP_DUP_FRAC", "0.1"))
    spark = get_spark("bench-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    docs, n_base = synthesize(spark, n_docs, dup_frac)
    docs = docs.localCheckpoint(eager=True)  # exclude generation cost
    n_total = docs.count()

    t0 = time.monotonic()
    sig = D.minhash_signatures(docs, "text", "doc_id", k=8)
    cand = D.lsh_candidate_pairs(sig, "doc_id", bands=4, rows_per_band=2)
    confirmed = D.jaccard_pairs(
        docs, "text", "doc_id", threshold=0.7, candidates=cand
    )
    losers = confirmed.select(F.col("id_b").alias("doc_id")).distinct()
    kept = docs.join(losers, "doc_id", "left_anti")
    n_kept = kept.count()
    wall = time.monotonic() - t0

    # truth: every doc_id >= n_base is a planted near-dup
    dropped = docs.join(losers, "doc_id", "left_semi")
    n_planted = n_total - n_base
    true_pos = dropped.filter(F.col("doc_id") >= n_base).count()
    false_pos = dropped.filter(F.col("doc_id") < n_base).count()

    print(
        json.dumps(
            {
                "metric": "dedup_docs_per_sec",
                "value": round(n_total / wall, 1),
                "unit": "docs/sec",
                "docs": n_total,
                "kept": n_kept,
                "wall_sec": round(wall, 2),
                "planted": n_planted,
                "recall": round(true_pos / n_planted, 4) if n_planted else None,
                "false_positives": false_pos,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
