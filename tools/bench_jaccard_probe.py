#!/usr/bin/env python3
"""Incremental exact-Jaccard probe benchmark at a real scale factor.

Builds the persistable PPJoin index over the sf documents table (the
"accepted corpus"), then probes a batch made of (a) near-duplicates of
stored docs (first line perturbed) and (b) fresh synthetic docs, and
reports one JSON line: index-build wall, probe wall, candidate-pair
count, matches found, and the stop-token suppression ratio
(all-token pair groups the OLD r7 shape would have aggregated vs the
prefix-only candidate count the fixed shape actually joins).

Sets are word 3-gram SHINGLES (BENCH_PROBE_SHINGLE_N), the unit real
dedup pipelines compare: the sf documents table draws from a ~30-word
vocabulary, so unigram sets are degenerate (every long doc contains
every word — measured 4.93M "candidates" and 2.1M true >=3/5 matches
out of 10M pairs, prefix filtering structurally can't help when every
token is corpus-wide). Shingles restore distinctiveness.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
BENCH_PROBE_BATCH (default 2000 docs, half near-dup half fresh),
BENCH_PROBE_SHINGLE_N (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from product_etl_spark.operators.dedup_incremental import (  # noqa: E402
    _rank_batch_prefix,
    build_jaccard_index,
    probe_candidate_pairs,
    probe_jaccard_index,
)
from product_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_batch = int(os.environ.get("BENCH_PROBE_BATCH", "2000"))
    shingle_n = int(os.environ.get("BENCH_PROBE_SHINGLE_N", "3"))
    spark = get_spark("bench-jaccard-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_store = docs.count()

    half = n_batch // 2
    near = (
        docs.orderBy("doc_id")
        .limit(half)
        .select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.concat(F.lit("zq zx zz "), F.expr("substring(text, 12)")).alias(
                "text"
            ),
        )
    )
    fresh = spark.range(half).select(
        (F.col("id") + 20_000_000).alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("fz"),
                    (F.xxhash64(F.col("id"), F.lit(i)) % 5000 + 5000) % 5000,
                )
                for i in range(40)
            ],
        ).alias("text"),
    )
    batch = near.unionByName(fresh).localCheckpoint(eager=True)

    t0 = time.monotonic()
    idx = build_jaccard_index(
        docs, "text", "doc_id", 3, 5, shingle_n=shingle_n
    ).localCheckpoint(
        eager=True
    )
    build_wall = time.monotonic() - t0

    bpref = _rank_batch_prefix(idx, batch, "text", "doc_id", 3, 5, shingle_n)
    # the pair-group count the OLD r7 all-token shape aggregated over
    all_token_pairs = (
        bpref.select("bid", "tok")
        .join(idx.select("tok", "id"), "tok")
        .select("bid", "id")
        .distinct()
        .count()
    )
    n_cand = probe_candidate_pairs(idx, bpref).count()

    t1 = time.monotonic()
    matches = probe_jaccard_index(
        idx, batch, "text", "doc_id", 3, 5, shingle_n=shingle_n
    )
    n_matches = matches.count()
    probe_wall = time.monotonic() - t1

    print(
        json.dumps(
            {
                "metric": "jaccard_probe_wall",
                "value": round(probe_wall, 2),
                "unit": "sec",
                "store_docs": n_store,
                "batch_docs": n_batch,
                "shingle_n": shingle_n,
                "index_build_sec": round(build_wall, 2),
                "candidate_pairs": n_cand,
                "all_token_pair_groups": all_token_pairs,
                "suppression_ratio": round(all_token_pairs / max(n_cand, 1), 1),
                "matches": n_matches,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
