#!/usr/bin/env python3
"""Volume probe for the HTML->clean-text extractor
(operators/html_text): 200k synthetic product-page documents
(~1.1 KB of markup each, ~220 MB total) through BOTH paths — the
codegen regexp chain and the Arrow-batched html.parser UDF — plus
the full cleaning chain (html_to_text -> c4_line_filters ->
c4_document_filters) as one map stage. Measures wall and MB/s,
verifies the two paths agree on every row (the corpus is
well-formed by construction), and prints one JSON line.

Both paths are map-only, so the numbers scale linearly with input
splits — the point of the drive is the CONSTANT: how much slower is
stdlib-parser Python per byte than JVM regexp codegen.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from product_etl_spark.functions.text import (
    c4_document_filters,
    c4_line_filters,
)
from product_etl_spark.operators.html_text import (
    html_to_text,
    html_to_text_tolerant,
)
from product_etl_spark.session import get_spark

N_DOCS = 200_000


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bench-html-text",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic well-formed product pages built executor-side
    html = F.concat(
        F.lit(
            '<html><head><style type="text/css">p { margin: 0; }</style>'
            '<script>if (a < b) { track("page", "x&y"); }</script></head>'
            '<body><h1 class="t">Product '
        ),
        F.col("id").cast("string"),
        F.lit("</h1><!-- sku variant markup --><ul>"),
        F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(1), F.lit(12)),
                lambda i: F.concat(
                    F.lit("<li>feature "),
                    (F.col("id") % 97 * 31 + i).cast("string"),
                    F.lit(" with a longer description clause &amp; "
                          "specification value number "),
                    (i * 7).cast("string"),
                    F.lit(".</li>"),
                ),
            ),
        ),
        F.lit(
            "</ul><p>Stainless&nbsp;steel build &lt;grade"
            " A&gt;, ships worldwide.</p><div>tail&quot;line&quot;"
            "</div></body></html>"
        ),
    )
    docs = (
        spark.range(N_DOCS)
        .select("id", html.alias("html"))
        .localCheckpoint(eager=True)
    )
    total_bytes = docs.agg(
        F.sum(F.length("html")).alias("b")
    ).collect()[0]["b"]

    def timed(colfn):
        t0 = time.time()
        n = docs.select(colfn(F.col("html")).alias("t")).agg(
            F.sum(F.length("t")).alias("n")
        ).collect()[0]["n"]
        return time.time() - t0, n

    sec_exact, out_exact = timed(html_to_text)
    sec_tol, out_tol = timed(html_to_text_tolerant)

    # dual-path agreement over the WHOLE corpus (well-formed input)
    diff = (
        docs.select(
            html_to_text(F.col("html")).alias("a"),
            html_to_text_tolerant(F.col("html")).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .count()
    )

    # full cleaning chain as one map stage
    t0 = time.time()
    kept = (
        docs.select(
            c4_line_filters(html_to_text(F.col("html"))).alias("s")
        )
        .select(c4_document_filters(F.col("s.text")).alias("d"))
        .agg(F.sum(F.col("d.keep").cast("bigint")).alias("k"))
        .collect()[0]["k"]
    )
    sec_chain = time.time() - t0

    mb = total_bytes / 1e6
    print(
        json.dumps(
            {
                "docs": N_DOCS,
                "input_mb": round(mb, 1),
                "codegen_sec": round(sec_exact, 2),
                "codegen_mb_s": round(mb / sec_exact, 1),
                "tolerant_sec": round(sec_tol, 2),
                "tolerant_mb_s": round(mb / sec_tol, 1),
                "chain_sec": round(sec_chain, 2),
                "paths_disagree_rows": diff,
                "out_chars_equal": out_exact == out_tol,
                "chain_docs_kept": kept,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
