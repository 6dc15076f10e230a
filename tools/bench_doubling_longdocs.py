#!/usr/bin/env python3
"""The doubling construction in ITS OWN regime: documents far beyond
the blocked method's max_doc_tokens guard (3,000 tokens vs the 2,048
default — blocked would raise; doubling doesn't care). 2,000 docs x
3,000 tokens = 6M positions with a planted 100-token duplicated run
shared by every (17k, 17k+1) doc pair.

What this pins beyond tools/bench_suffix_scale.py (which ran doubling
on 60-token docs): (a) the round count follows the longest REPEAT
(~log2(100) -> 8 refinement rounds), NOT the document length — the
whole point of the path; (b) planted recovery stays EXACT at
100-token span lengths, i.e. the binary-lifting LCP reconstructs
lengths far past min_len. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from product_etl_spark.operators.suffixes import suffix_duplicated_spans
from product_etl_spark.session import get_spark

N_DOCS = 2_000
DOC_LEN = 3_000
VOCAB = 100_000
RUN_LEN = 100
RUN_AT = 500  # planted run occupies tokens [500, 600)


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bench-doubling-longdocs",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    tok = (
        F.when(
            (F.col("doc_id") % 17 < 2)
            & (F.col("j") >= RUN_AT)
            & (F.col("j") < RUN_AT + RUN_LEN),
            F.concat(
                F.lit("d"),
                (F.floor(F.col("doc_id") / 17) * 1000 + F.col("j")).cast(
                    "string"
                ),
            ),
        ).otherwise(
            F.concat(
                F.lit("t"),
                (
                    F.abs(F.xxhash64(F.col("doc_id") * 100_000 + F.col("j")))
                    % VOCAB
                ).cast("string"),
            )
        )
    )
    docs = (
        spark.range(N_DOCS)
        .select(F.col("id").alias("doc_id"))
        .join(spark.range(DOC_LEN).select(F.col("id").alias("j")), how="cross")
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

    t0 = time.time()
    got = {
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in suffix_duplicated_spans(
            docs, "text", "doc_id", min_len=8, method="doubling"
        ).collect()
    }
    sec = round(time.time() - t0, 2)

    expected = {
        (d, RUN_AT, RUN_LEN)
        for d in range(N_DOCS)
        if d % 17 < 2 and (d + 1 if d % 17 == 0 else d - 1) < N_DOCS
    }
    assert got == expected, (
        f"planted recovery mismatch: {len(got)} vs {len(expected)}; "
        f"sample diff {list(got ^ expected)[:5]}"
    )
    print(
        json.dumps(
            {
                "docs": N_DOCS,
                "doc_len": DOC_LEN,
                "positions": N_DOCS * DOC_LEN,
                "planted_span_len": RUN_LEN,
                "sec": sec,
                "positions_per_sec": int(N_DOCS * DOC_LEN / sec),
                "spans": len(got),
                "exact": True,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
