#!/usr/bin/env python3
"""Volume probe for the suffix-array dedup family (operators/
suffixes.py): synthetic corpus far beyond sf0.1 (documents there are
5k docs / 270k positions), timing BOTH constructions end-to-end on
the spans surface plus the removal rung. Prints one JSON line.

Corpus: N_DOCS documents of DOC_LEN hashed tokens over a bounded
vocabulary (xxhash64-driven — no Python RNG, reproducible), with a
planted 20-token cross-document duplicated run shared by every
(37k, 37k+1) doc pair so the duplicated fraction is realistic rather
than zero. The point is the scale SHAPE: blocked is one array sort
over sum(len*(len+1)/2) ids; doubling is O(log repeat) linear
rounds — both must stay linear in the corpus with no skew cliff.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from product_etl_spark.operators.suffixes import (
    suffix_duplicated_spans,
    suffix_remove_duplicates,
)
from product_etl_spark.session import get_spark

N_DOCS_BLOCKED = 200_000
N_DOCS_DOUBLING = 50_000
DOC_LEN = 60
VOCAB = 50_000


def _corpus(spark, n_docs):
    # token j of doc i: hashed into the vocab; every doc pair
    # (37k, 37k+1) shares tokens 10..29 (a 20-token planted dup run)
    tok = (
        F.when(
            (F.col("doc_id") % 37 < 2)
            & (F.col("j") >= 10)
            & (F.col("j") < 30),
            F.concat(
                F.lit("d"),
                (
                    F.floor(F.col("doc_id") / 37) * 100 + F.col("j")
                ).cast("string"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("t"),
                (
                    F.abs(F.xxhash64(F.col("doc_id") * 1000 + F.col("j")))
                    % VOCAB
                ).cast("string"),
            )
        )
    )
    return (
        spark.range(n_docs)
        .select(F.col("id").alias("doc_id"))
        .join(
            spark.range(DOC_LEN).select(F.col("id").alias("j")),
            how="cross",
        )
        .select("doc_id", "j", tok.alias("tok"))
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("text")
        )
        .localCheckpoint(eager=True)
    )


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bench-suffix-scale",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}

    docs_b = _corpus(spark, N_DOCS_BLOCKED)
    t0 = time.time()
    n_spans = suffix_duplicated_spans(
        docs_b, "text", "doc_id", min_len=8, method="blocked"
    ).count()
    tb = round(time.time() - t0, 2)
    out["blocked_spans"] = {
        "docs": N_DOCS_BLOCKED,
        "positions": N_DOCS_BLOCKED * DOC_LEN,
        "sec": tb,
        "spans": n_spans,
        "positions_per_sec": int(N_DOCS_BLOCKED * DOC_LEN / tb),
    }

    t0 = time.time()
    n_rm = (
        suffix_remove_duplicates(
            docs_b, "text", "doc_id", min_len=8, method="blocked"
        )
        .agg(F.sum("n_removed"))
        .collect()[0][0]
    )
    tr = round(time.time() - t0, 2)
    out["blocked_removal"] = {
        "docs": N_DOCS_BLOCKED,
        "sec": tr,
        "tokens_removed": int(n_rm),
    }

    docs_d = _corpus(spark, N_DOCS_DOUBLING)
    t0 = time.time()
    n_spans_d = suffix_duplicated_spans(
        docs_d, "text", "doc_id", min_len=8, method="doubling"
    ).count()
    td = round(time.time() - t0, 2)
    out["doubling_spans"] = {
        "docs": N_DOCS_DOUBLING,
        "positions": N_DOCS_DOUBLING * DOC_LEN,
        "sec": td,
        "spans": n_spans_d,
        "positions_per_sec": int(N_DOCS_DOUBLING * DOC_LEN / td),
    }
    # planted-dup accounting: every 37-pair shares one 20-token run
    expected_pairs_b = sum(
        1 for i in range(N_DOCS_BLOCKED) if i % 37 < 2
    )
    out["planted_check"] = {
        "blocked_spans_expected": expected_pairs_b,
        "blocked_spans_found": n_spans,
    }

    # cross-color path at volume: 2% of docs play the benchmark, so
    # same-color (corpus) runs in suffix order are CORPUS-sized —
    # exactly the regime the segmented scans exist for. The planted
    # 37-pair runs are corpus-corpus and must stay invisible; the
    # only contamination is the hash-accidental kind (near zero at
    # this vocab), so the check is the semantic, not a count.
    from product_etl_spark.operators.suffixes import (
        suffix_shared_span_coverage,
    )

    tagged = docs_b.withColumn(
        "src",
        F.when(F.col("doc_id") % 50 == 0, F.lit("bench")).otherwise(
            F.lit("corpus")
        ),
    )
    t0 = time.time()
    cov = (
        suffix_shared_span_coverage(
            tagged, "text", "doc_id", "src", min_len=8
        )
        .filter(F.col("color") == "corpus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("covered")).alias("cov"),
        )
        .collect()[0]
    )
    tc = round(time.time() - t0, 2)
    # planted corpus-corpus pairs whose BOTH docs are corpus-colored:
    # all of them (benchmark is %50; planted pairs are %37 — overlap
    # docs are bench-colored and drop out of the corpus side)
    out["cross_color_coverage"] = {
        "docs": N_DOCS_BLOCKED,
        "sec": tc,
        "corpus_docs": int(cov["n"]),
        "covered_tokens": int(cov["cov"] or 0),
    }
    print(json.dumps({"metric": "suffix_scale_probe", **out}))
    spark.stop()


if __name__ == "__main__":
    main()
