"""Lexical retrieval over the documents table: BM25 scoring.

Okapi BM25 (Robertson/Sparck Jones; the Lucene-default ranking
function) complements the q99 TF-IDF ranking and the vector paths
(similarity.py, pq.py): a training-data pipeline uses it for
quality-by-retrieval curation ("find docs like these seed docs") and
for benchmark decontamination fallbacks where embeddings don't exist.

Scale shape: tokenization is a map; tf filters to the query's terms
BEFORE aggregating (the per-(doc,term) shuffle carries only matching
tokens); df and the corpus stats are term-keyed / scalar aggregates
that broadcast back; the final score is one doc-keyed decimal sum and
a TakeOrdered top-k. No corpus-wide window, no driver loop.

Cross-engine determinism (the oracle contract): every per-term
contribution is computed from integers (tf, df, dl) and two shared
scalars (N, avgdl) with a FIXED expression shape, rounded to 9
decimals, and summed as DECIMAL(18,9) — decimal addition is
order-insensitive, so the score that ranks documents is bit-equal in
Spark and DuckDB regardless of aggregation order (the repo-wide
"decimal casts for reorderable sums" rule). ``ln`` is the one libm
call; both engines agree within 1 ulp and the 1e-9 rounding absorbs
it (the q113 perplexity precedent).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from product_etl_spark.functions.text import TERM_RE, index_terms


def _normalize_terms(terms: list[str]) -> list[str]:
    """Lowercase, validate against the index alphabet, dedup.

    Terms that cannot match any indexed token (mixed alphabet,
    punctuation, empties) are REJECTED loudly: "Spark" or "don't"
    would otherwise silently retrieve nothing on both engines.
    Duplicates collapse — scoring is SET-of-terms semantics
    (query-side term frequency is not modeled); the dedup makes that
    explicit instead of depending on the IN-list/groupBy quietly
    doing it."""
    if not terms:
        raise ValueError("bm25 needs at least one query term")
    norm, bad = [], []
    for t in terms:
        lt = str(t).lower()
        if re.fullmatch(TERM_RE, lt):
            if lt not in norm:
                norm.append(lt)
        else:
            bad.append(t)
    if bad:
        raise ValueError(
            f"query terms not in the index alphabet {TERM_RE}: {bad!r} "
            "(tokenize/strip them first)"
        )
    return norm


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    top_n: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``top_n`` documents for a set-of-terms query by BM25
    (duplicate query terms collapse; see _normalize_terms).

    Returns (doc_id, score, n_hit_terms), score rounded to 6 for
    output; the RANKING key is the unrounded decimal sum (ties ->
    lowest doc_id).
    """
    terms = _normalize_terms(terms)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(index_terms(text_col)).alias("term"),
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = (
        toks.filter(F.col("term").isin(list(terms)))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # avgdl = total tokens / N over ALL documents (the Okapi/Lucene
    # definition) — averaging only token-bearing docs would inflate
    # avgdl whenever the corpus has empty/NULL texts and weaken the
    # length normalization
    stats = (
        docs.agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(dl.agg(F.sum("dl").alias("_sum_dl")))
        .withColumn(
            "avgdl",
            F.col("_sum_dl").cast("double") / F.col("n_docs").cast("double"),
        )
        .drop("_sum_dl")
    )
    # contribution, shaped EXACTLY like the oracle SQL:
    #   idf  = ln(1 + (N - df + 0.5) / (df + 0.5))
    #   tfn  = (tf * (k1+1)) / (tf + k1 * (1 - b + b * dl / avgdl))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_contrib",
            F.round(
                F.expr(
                    f"ln(1.0D + ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE))"
                    f" + 0.5D) / (CAST(df AS DOUBLE) + 0.5D))"
                    f" * ((CAST(tf AS DOUBLE) * {k1 + 1.0!r}D)"
                    f" / (CAST(tf AS DOUBLE) + {k1!r}D * ((1.0D - {b!r}D)"
                    f" + {b!r}D * (CAST(dl AS DOUBLE) / avgdl))))"
                ),
                9,
            ).cast("decimal(18,9)"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("_contrib").alias("_score_dec"),
        F.count(F.lit(1)).alias("n_hit_terms"),
    )
    return (
        agg.orderBy(F.col("_score_dec").desc(), F.col("doc_id").asc())
        .limit(top_n)
        .select(
            "doc_id",
            F.round(F.col("_score_dec").cast("double"), 6).alias("score"),
            "n_hit_terms",
        )
    )


def bm25_oracle_sql(
    terms: list[str], top_n: int = 10, k1: float = 1.2, b: float = 0.75
) -> str:
    """DuckDB SQL mirroring bm25_topk on the ``documents`` view —
    same term normalization, same expression shape, same 1e-9
    rounding, same decimal sum. Terms are validated/escaped before
    interpolation (a quote or an empty list would otherwise generate
    unparseable SQL)."""
    terms = _normalize_terms(terms)
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(COALESCE(text, '')),
                                       '{TERM_RE}')) AS term
      FROM documents
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM toks WHERE term IN ({in_list}) GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), stats AS (
      SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
             (SELECT CAST(SUM(dl) AS DOUBLE) FROM dl)
               / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS avgdl
    ), scored AS (
      SELECT tf.doc_id,
             CAST(ROUND(
               ln(CAST(1.0 AS DOUBLE)
                  + ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE))
                     + CAST(0.5 AS DOUBLE))
                    / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
               * ((CAST(tf AS DOUBLE) * CAST({k1 + 1.0!r} AS DOUBLE))
                  / (CAST(tf AS DOUBLE) + CAST({k1!r} AS DOUBLE)
                     * ((CAST(1.0 AS DOUBLE) - CAST({b!r} AS DOUBLE))
                        + CAST({b!r} AS DOUBLE)
                          * (CAST(dl AS DOUBLE) / avgdl)))),
               9) AS DECIMAL(18,9)) AS contrib
      FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id)
      CROSS JOIN stats
    )
    SELECT doc_id,
           ROUND(CAST(SUM(contrib) AS DOUBLE), 6) AS score,
           COUNT(*) AS n_hit_terms
    FROM scored GROUP BY doc_id
    ORDER BY SUM(contrib) DESC, doc_id ASC
    LIMIT {top_n}
    """
