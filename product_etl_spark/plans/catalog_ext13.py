"""Thirteenth extension catalog (q188+): round-11 additions — the
unigram-tokenizer engine-exact twin (q188, the tokenizer-family
driver row the r10 verdict asked for alongside operators/unigram.py's
float EM trainer) and SemDeDup (q189, embedding-level semantic dedup
as an IVF-cell + intra-cell exact-cosine composition).

Every entry keeps the repo invariants: identical column names/aliases
between the Spark plan and the DuckDB oracle, integer-decided ranks,
decimal sums surfaced as DOUBLE/BIGINT only (never Decimal), and a
`Scale shape:` audit in each docstring.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from product_etl_spark.plans.catalog import _t, register


@register(
    "q188_unigram_min_pieces",
    r"""
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             UNNEST(list_filter(
               string_split_regex(lower(COALESCE(text,'')), '\s+'),
               x -> x <> '')) AS word
      FROM documents
    ), wc AS (
      SELECT word, COUNT(*) AS wn FROM toks GROUP BY word
    ), cand AS (
      SELECT piece, SUM(wn) AS pn FROM (
        SELECT wc.wn,
               UNNEST(flatten([[substr(wc.word, i, l)
                 FOR i IN RANGE(1, GREATEST(LENGTH(wc.word) - l + 2, 1))]
                 FOR l IN RANGE(2, 5)])) AS piece
        FROM wc
      )
      GROUP BY piece
    ), vocab AS (
      SELECT piece FROM (
        SELECT piece,
               ROW_NUMBER() OVER (ORDER BY pn DESC, piece ASC) AS r
        FROM cand
      ) WHERE r <= 40
      UNION
      SELECT DISTINCT UNNEST([substr(word, i, 1)
               FOR i IN RANGE(1, LENGTH(word) + 1)]) AS piece
      FROM (SELECT DISTINCT word FROM toks)
    ), dw AS (
      SELECT DISTINCT word FROM toks
    ), reach(word, pos, k) AS (
      SELECT word, 0, 0 FROM dw
      UNION
      SELECT r.word, r.pos + LENGTH(v.piece), r.k + 1
      FROM reach r JOIN vocab v
        ON substr(r.word, r.pos + 1, LENGTH(v.piece)) = v.piece
      WHERE r.pos < LENGTH(r.word)
    ), cost AS (
      SELECT word, MIN(k) AS k FROM reach
      WHERE pos = LENGTH(word) GROUP BY word
    )
    SELECT d.doc_id,
           CAST(COALESCE(SUM(c.k), 0) AS BIGINT) AS n_tokens
    FROM documents d
    LEFT JOIN toks t ON t.doc_id = d.doc_id
    LEFT JOIN cost c ON c.word = t.word
    GROUP BY d.doc_id
    """,
)
def q188_unigram_min_pieces(spark, sf_dir):
    """Tokenizer-family driver row: per-document token counts under
    OPTIMAL minimum-piece segmentation over a corpus-learned piece
    inventory (operators/unigram.candidate_pieces +
    min_pieces_costs). The inventory is the top-40 substrings of
    length 2-4 by total corpus occurrences (ties piece-ascending)
    plus every character, so every word segments; min piece count per
    word is then a UNIQUE integer — no float, no tie-break — which
    the oracle reproduces with a recursive-CTE breadth-first search.
    This is the engine-exact integer twin of the float unigram-LM EM
    trainer (train_unigram, pytest-pinned on planted corpora): the
    q142<->q93 treatment applied to tokenizers. The reference has no
    tokenizer (SURVEY §2 M-family is translation/OCR); this extends
    the LLM-pipeline ladder whose BPE rung is q50/operators/bpe.py.

    Scale shape: one word-count shuffle; the substring explode and
    the DP both run over the DISTINCT-word dict (vocab-sized, never
    corpus-sized); the piece inventory is a bounded TakeOrdered +
    broadcast; the per-word DP is map-only Arrow-batched
    O(len x max_piece_len); one join back to (doc, word) occurrences
    and one per-doc groupBy-sum. No corpus self-join, no unbounded
    collect (min_pieces_costs raises over its vocab cap)."""
    from product_etl_spark.operators.unigram import (
        candidate_pieces,
        min_pieces_costs,
    )

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+"),
                lambda x: x != "",
            )
        ).alias("word"),
    )
    pieces = candidate_pieces(d, "text", min_len=2, max_len=4, top_n=40)
    costs = min_pieces_costs(
        toks.select("word").distinct(), pieces
    )
    return (
        d.select("doc_id")
        .join(toks.join(costs, "word"), "doc_id", "left")
        .groupBy("doc_id")
        .agg(
            F.coalesce(
                F.sum(F.col("n_pieces").cast("long")), F.lit(0).cast("long")
            ).alias("n_tokens")
        )
    )
