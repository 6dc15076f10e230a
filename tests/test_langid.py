"""Trained char-trigram language ID: accuracy on PLANTED multilingual
text (the synthetic corpus is all-latin, so the catalog row q127 only
proves plumbing/parity), determinism, short-doc guard."""

from __future__ import annotations

from pyspark.sql import functions as F

from product_etl_spark.operators.langid import (
    _doc_trigrams,
    classify_char_ngram,
    train_char_ngram_profiles,
)

_SAMPLES = {
    "en": [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "a training corpus needs clean text and careful deduplication",
        "the weather this morning was cold with a chance of light rain",
    ],
    "de": [
        "der schnelle braune fuchs springt ueber den faulen hund am fluss",
        "ein trainingskorpus braucht sauberen text und sorgfaeltige arbeit",
        "das wetter heute morgen war kalt mit leichtem regen am abend",
    ],
    "fr": [
        "le rapide renard brun saute par dessus le chien paresseux",
        "un corpus d entrainement exige du texte propre et soigne",
        "le temps ce matin etait froid avec une pluie legere au soir",
    ],
}


def _corpus(spark):
    rows, i = [], 0
    for lang, texts in _SAMPLES.items():
        for t in texts:
            rows.append((i, t, lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_planted_accuracy_and_determinism(spark):
    docs = _corpus(spark)
    profiles = train_char_ngram_profiles(docs, "text", "lang", "doc_id", 40)
    # hold-out style: classify fresh sentences in each language
    test = spark.createDataFrame(
        [
            (100, "the lazy dog sleeps near the warm fire", "en"),
            (101, "der faule hund schlaeft am warmen feuer", "de"),
            (102, "le chien paresseux dort pres du feu chaud", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    pred = classify_char_ngram(test, profiles, "text", "doc_id")
    got = {r["doc_id"]: r["predicted"] for r in pred.collect()}
    assert got == {100: "en", 101: "de", 102: "fr"}
    # deterministic under recomputation
    again = {
        r["doc_id"]: r["predicted"]
        for r in classify_char_ngram(test, profiles, "text", "doc_id").collect()
    }
    assert again == got
    # profiles broadcast in the classify plan
    plan = pred._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_short_and_null_docs_have_no_grams(spark):
    docs = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, None), (4, "abc")],
        "doc_id long, text string",
    )
    g = _doc_trigrams(docs, "text", "doc_id")
    rows = [(r["doc_id"], r["gram"]) for r in g.collect()]
    assert rows == [(4, "abc")]


def test_profile_ties_break_lexicographically(spark):
    docs = spark.createDataFrame(
        [(1, "aaab", "x"), (2, "aaab", "x")],
        "doc_id long, text string, lang string",
    )
    # distinct grams per doc: {aaa, aab} both count 2 -> top-1 is 'aaa'
    p = train_char_ngram_profiles(docs, "text", "lang", "doc_id", 1)
    assert [(r["label"], r["gram"]) for r in p.collect()] == [("x", "aaa")]
