"""Trained character-n-gram language identification.

Complements the script heuristic (functions/text.detect_script — a
stateless map) with the classic trained path: per-language character
trigram profiles (Cavnar/Trenkle n-gram text categorization) learned
from labeled documents, classification by profile overlap. This is
the shape fastText/langid.py distill to at inference time: tiny
per-language models, a map-side join against the corpus.

Engine-exact by construction: profiles are top-K grams by integer
count (ties -> gram lexicographic), classification is an integer
distinct-match count (ties -> language lexicographic) — no floats
anywhere, so the DuckDB oracle matches bit-for-bit.

Scale shape: profiles are n_langs x K rows -> BROADCAST; the corpus
is tokenized map-side (transform over a char sequence, no UDF),
deduped per doc, and aggregated per (doc, lang) with map-side
combine. The training aggregation shuffles (lang, gram) counts once;
the rank<=K filter bounds its window per language
(WindowGroupLimit). No corpus self-join, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _doc_trigrams(
    df: DataFrame, text_col: str, id_col: str, *carry_cols: str
) -> DataFrame:
    """(id, *carry_cols, gram): DISTINCT lowercased char trigrams per
    document. ``carry_cols`` ride THROUGH the explode so callers never
    join the (corpus x grams)-sized frame back to the source just to
    recover a label — at test scale the join is cheap, but at 100 TB
    it is a full extra shuffle of the gram frame.
    Documents shorter than 3 chars have no grams and drop out. The
    short-doc case is an explicit empty array — Spark's
    ``sequence(1, 0)`` would DESCEND ([1, 0]), not return empty like
    DuckDB's RANGE, so an unguarded transform would fabricate grams
    from 1-2-char docs."""
    # Lowercase ONCE into a projected column before the lambda:
    # Catalyst does no CSE inside higher-order functions, so an
    # inline lower(coalesce(text)) would re-lowercase the whole
    # document for EVERY trigram position — O(len^2) per doc
    # (measured: q127 at sf0.1 dropped 4.4 s -> 2.6 s).
    grams = F.array_distinct(
        F.expr(
            "IF(length(_s) < 3, array(), "
            "transform(sequence(1, length(_s) - 2), "
            "i -> substring(_s, i, 3)))"
        )
    )
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.lower(F.coalesce(F.col(text_col), F.lit(""))).alias("_s"),
    ).select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.explode(grams).alias("gram"),
    )


def train_char_ngram_profiles(
    docs: DataFrame,
    text_col: str,
    label_col: str,
    id_col: str,
    top_per_lang: int = 50,
) -> DataFrame:
    """(label, gram) profile rows: the ``top_per_lang`` most frequent
    distinct-per-doc char trigrams of each language's labeled docs
    (ties -> lexicographically first gram, so the profile is
    deterministic)."""
    g = _doc_trigrams(docs, text_col, id_col, label_col)
    counts = (
        g.withColumnRenamed(label_col, "_lang")
        .groupBy("_lang", "gram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("_lang").orderBy(F.col("n").desc(), F.col("gram").asc())
    return (
        counts.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= top_per_lang)
        .select(F.col("_lang").alias("label"), "gram")
    )


def classify_char_ngram(
    docs: DataFrame,
    profiles: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """(id, predicted, n_matched): each document classified as the
    language whose profile shares the most DISTINCT trigrams with it
    (ties -> lexicographically first language). Documents matching no
    profile gram at all are absent (nothing to vote with) — filter
    upstream or union a default if a prediction is mandatory."""
    g = _doc_trigrams(docs, text_col, id_col)
    scores = (
        g.join(F.broadcast(profiles), "gram")
        .groupBy(id_col, "label")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    best = scores.groupBy(id_col).agg(
        F.min(
            F.struct(
                (-F.col("n_matched")).alias("nn"), F.col("label").alias("lang")
            )
        ).alias("_b")
    )
    return best.select(
        id_col,
        F.col("_b.lang").alias("predicted"),
        (-F.col("_b.nn")).alias("n_matched"),
    )


def langid_confusion_oracle_sql(top_per_lang: int = 50) -> str:
    """DuckDB SQL for the q127 catalog entry: train on even doc_ids,
    classify odd doc_ids, emit the (lang, predicted, n_docs)
    confusion counts."""
    return f"""
    WITH g AS (
      SELECT doc_id,
             UNNEST(list_distinct([substr(lower(COALESCE(text,'')), i, 3)
                     FOR i IN RANGE(1, GREATEST(0, LENGTH(lower(COALESCE(text,''))) - 2) + 1)]))
               AS gram
      FROM documents
    ),
    counts AS (
      SELECT d.lang AS label, g.gram, COUNT(*) AS n
      FROM g JOIN documents d USING (doc_id)
      WHERE d.doc_id % 2 = 0
      GROUP BY d.lang, g.gram
    ),
    profiles AS (
      SELECT label, gram FROM (
        SELECT label, gram,
               ROW_NUMBER() OVER (PARTITION BY label
                                  ORDER BY n DESC, gram ASC) AS r
        FROM counts
      ) WHERE r <= {int(top_per_lang)}
    ),
    scores AS (
      SELECT g.doc_id, p.label, COUNT(*) AS n_matched
      FROM g JOIN profiles p USING (gram)
      WHERE g.doc_id % 2 = 1
      GROUP BY g.doc_id, p.label
    ),
    best AS (
      SELECT doc_id, label AS predicted FROM (
        SELECT doc_id, label,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY n_matched DESC, label ASC) AS r
        FROM scores
      ) WHERE r = 1
    )
    SELECT d.lang, b.predicted, COUNT(*) AS n_docs
    FROM best b JOIN documents d USING (doc_id)
    GROUP BY d.lang, b.predicted
    """
