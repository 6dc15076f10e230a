"""BPE tokenizer (operators/bpe.py): learned merges match the
hand-traceable Sennrich example, encoding is consistent with
training segmentations, and unseen words fall back gracefully."""

from __future__ import annotations

from product_etl_spark.operators.bpe import encode_bpe, train_bpe


def _docs(spark):
    # the classic low/lower/newest-style corpus: merge order is
    # hand-checkable from the word frequencies
    return spark.createDataFrame(
        [
            (1, "low low low low low"),
            (2, "lower lower"),
            (3, "newest newest newest newest newest newest"),
            (4, "widest widest widest"),
        ],
        ["doc_id", "text"],
    )


def test_learned_merges_follow_frequencies(spark):
    merges = train_bpe(_docs(spark), "text", n_merges=10)
    # 'es' (newest x6 + widest x3 = 9) then 'est' then 'est</w>' are
    # the classic first merges for this corpus
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")
    assert ("l", "o") in merges  # low-family merge appears later


def test_encode_matches_training_segmentation(spark):
    docs = _docs(spark)
    merges = train_bpe(docs, "text", n_merges=30)
    enc = {r["doc_id"]: r for r in
           encode_bpe(docs, "text", "doc_id", merges).collect()}
    # fully merged frequent words collapse to one token
    assert enc[1]["tokens"] == ["low</w>"] * 5
    assert enc[3]["tokens"] == ["newest</w>"] * 6
    assert enc[1]["n_tokens"] == 5


def test_unseen_word_falls_back_to_subwords(spark):
    docs = _docs(spark)
    merges = train_bpe(docs, "text", n_merges=30)
    unseen = spark.createDataFrame([(9, "lowest")], ["doc_id", "text"])
    [row] = encode_bpe(unseen, "text", "doc_id", merges).collect()
    # 'lowest' never seen, but 'low' + 'est</w>' were both learned
    assert row["tokens"] == ["low", "est</w>"]


def test_empty_and_null_text(spark):
    docs = _docs(spark)
    merges = train_bpe(docs, "text", n_merges=5)
    weird = spark.createDataFrame([(1, ""), (2, None)], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in
            encode_bpe(weird, "text", "doc_id", merges).collect()}
    assert rows[1]["n_tokens"] == 0 and rows[2]["n_tokens"] == 0


def test_nbsp_tokenization_matches_training(spark):
    # NBSP is NOT a Java \s+ boundary; training sees one word — the
    # encode kernel must agree (Python str.split would split it)
    docs = spark.createDataFrame([(1, "aa bb aa bb aa bb")],
                                 ["doc_id", "text"])
    merges = train_bpe(docs, "text", n_merges=8, min_pair_count=1)
    [row] = encode_bpe(docs, "text", "doc_id", merges).collect()
    # three occurrences of the single NBSP-joined word, fully merged
    assert row["n_tokens"] == 3
    assert row["tokens"][0] == "aa bb</w>"
