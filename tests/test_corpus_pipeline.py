"""End-to-end corpus curation: stage accounting, dedup behavior,
redaction, and split invariants on a corpus with planted problems."""

from __future__ import annotations

from pyspark.sql import functions as F

from product_etl_spark.pipelines.corpus import CurateConfig, curate_corpus
import pytest

GOOD = (  # 64 words: clears Gopher's >=50-word floor with margin
    "the quick brown fox jumps over the lazy dog while fifty two "
    "careful researchers watch the experiment unfold and record "
    "every observation in their long detailed notebooks before "
    "lunch arrives and the afternoon session begins with renewed "
    "energy across the whole laboratory team today as the senior "
    "director reads another draft report about careful sampling "
    "methods applied to large text corpora during model training"
)


def _corpus(spark):
    rows = [
        (0, GOOD + " alpha set one"),
        (1, GOOD + " alpha set one"),  # exact dup of 0
        (2, GOOD + " beta set two"),   # near dup of 0
        (3, "short junk"),             # fails gopher word count
        (4, " ".join(GOOD.split()[:24])
            + " meanwhile the gamma cohort assembled downstairs to "
            "compare notes about tokenizer vocabularies and sampling "
            "temperature schedules while debating whether curriculum "
            "ordering helps small models generalize across unseen "
            "domains contact me at alice@example.com please"),
        (5, "x " * 60),                # fails mean word length
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.slow
def test_curate_corpus_end_to_end(spark):
    train, val, rep = curate_corpus(
        _corpus(spark),
        config=CurateConfig(
            dedup_strategy="near",
            jaccard_threshold=0.8,
            segment_dedup_words=8,
            test_fraction=0.3,
        ),
        report=True,
    )
    assert rep["input"] == 6
    assert rep["after_filters"] == 4          # 3 and 5 filtered
    assert rep["after_doc_dedup"] == 2        # 1 exact-dropped, 2 near-dropped
    assert rep["after_segment_dedup"] == 2
    assert rep["train"] + rep["validation"] == 2

    out = train.unionByName(val)
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {0, 4}
    row4 = out.filter(F.col("doc_id") == 4).collect()[0]
    # PII gone, tokens counted, quality/lang annotated
    assert "<EMAIL>" in row4["text"] and "alice@example.com" not in row4["text"]
    assert row4["n_tokens"] > 0 and 0.0 <= row4["quality"] <= 1.0
    assert row4["lang_id"] is not None
    # doc 4's text lost its boilerplate head (doc 0 owns the first
    # occurrence of the shared GOOD segments) but kept its unique tail
    assert "gamma" in row4["text"]
    row0 = out.filter(F.col("doc_id") == 0).collect()[0]
    assert "quick brown fox" in row0["text"]


def test_curate_split_disjoint_exhaustive(spark):
    docs = spark.createDataFrame(
        [(i, GOOD + f" unique tail {i} segment") for i in range(200)],
        "doc_id long, text string",
    )
    cfg = CurateConfig(dedup_strategy=None, segment_dedup_words=None,
                       test_fraction=0.2)
    train, val, _ = curate_corpus(docs, config=cfg)
    t = {r["doc_id"] for r in train.collect()}
    v = {r["doc_id"] for r in val.collect()}
    assert t.isdisjoint(v) and len(t | v) == 200
    assert 10 <= len(v) <= 80  # ~20% with hash variance

    # stability: the same call yields the same membership
    train2, _, _ = curate_corpus(docs, config=cfg)
    assert {r["doc_id"] for r in train2.collect()} == t


def test_curate_with_packing(spark):
    docs = spark.createDataFrame(
        [(i, GOOD + f" unique tail {i} words") for i in range(60)],
        "doc_id long, text string",
    )
    cfg = CurateConfig(dedup_strategy=None, segment_dedup_words=None,
                       pack_tokens=256, test_fraction=0.0)
    train, val, _ = curate_corpus(docs, config=cfg)
    out = train.unionByName(val).orderBy("doc_id").collect()
    assert all(r["pack_id"] is not None for r in out)
    # packs follow doc_id order and are ~256 tokens each
    ids = [r["pack_id"] for r in out]
    assert ids == sorted(ids)
    import collections

    sizes = collections.Counter()
    for r in out:
        sizes[r["pack_id"]] += r["n_tokens"]
    full_packs = list(sizes.values())[:-1]
    assert all(200 <= v <= 256 + 70 for v in full_packs)


@pytest.mark.slow
def test_curate_with_decontam_and_leakage_safe_split(spark):
    from pyspark.sql import functions as F

    from product_etl_spark.pipelines.corpus import CurateConfig, curate_corpus
    from product_etl_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"]
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    cfg = CurateConfig(
        dedup_strategy="fingerprint",
        segment_dedup_words=None,
        benchmark_docs=bench,
        leakage_safe_split=True,
        test_fraction=0.1,
        jaccard_threshold=0.5,
    )
    train, val, rep = curate_corpus(corpus, config=cfg, report=True)
    assert rep["after_decontam"] <= rep["after_doc_dedup"] <= rep["input"]
    # no train doc shares its id with val, and the chain ran end-to-end
    t_ids = {r["doc_id"] for r in train.select("doc_id").collect()}
    v_ids = {r["doc_id"] for r in val.select("doc_id").collect()}
    assert t_ids and v_ids and t_ids.isdisjoint(v_ids)
    # the stage is wired in and reported (whether it drops anything
    # here depends on what the upstream filters already removed —
    # actual dropping is pinned by q112 and tests/test_decontam.py)
    assert "after_decontam" in rep
