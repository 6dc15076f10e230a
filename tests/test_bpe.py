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


def test_min_count_floor_preserves_merges(spark):
    """The driver-memory bound: a min_count floor + max_words cap must
    (a) shrink what train_bpe collects and (b) leave the learned merge
    list identical on a corpus whose merge-winning margins exceed the
    pruned tail mass."""
    from product_etl_spark.operators.bpe import word_counts

    docs = _docs(spark).union(
        # singleton tail words the floor prunes; their shared-prefix
        # pair mass (4) stays below the head merge margins (9)
        spark.createDataFrame(
            [(100 + i, f"zq{i}x") for i in range(4)],
            ["doc_id", "text"],
        )
    )
    unpruned = word_counts(docs, "text").collect()
    pruned = word_counts(docs, "text", min_count=2).collect()
    assert len(pruned) < len(unpruned)
    assert {r["word"] for r in pruned} == {"low", "lower", "newest", "widest"}

    m_full = train_bpe(docs, "text", n_merges=10, min_count=1,
                       max_words=None)
    m_floor = train_bpe(docs, "text", n_merges=10, min_count=2)
    m_capped = train_bpe(docs, "text", n_merges=10, min_count=2,
                         max_words=4)
    assert m_floor == m_capped
    # the head merges (driven by the frequent words) are unchanged;
    # the floor only prunes singleton-tail contributions
    assert m_floor[:3] == m_full[:3] == [
        ("e", "s"), ("es", "t"), ("est", "</w>")
    ]


def test_max_words_cap_bounds_collect(spark):
    from product_etl_spark.operators.bpe import word_counts

    docs = _docs(spark)
    capped = word_counts(docs, "text", max_words=2).collect()
    assert len(capped) == 2
    # deterministic top-N: (n desc, word asc) — newest x6, low x5
    assert [r["word"] for r in capped] == ["newest", "low"]


def test_encode_string_id_column(spark):
    """ADVICE fix: the output id keeps the input id type (was
    hardcoded 'long', which broke string doc ids at Arrow
    conversion)."""
    docs = _docs(spark)
    merges = train_bpe(docs, "text", n_merges=30)
    sdocs = spark.createDataFrame(
        [("doc-a", "low low"), ("doc-b", "newest")], ["doc_id", "text"]
    )
    out = encode_bpe(sdocs, "text", "doc_id", merges)
    assert out.schema["doc_id"].dataType.typeName() == "string"
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows["doc-a"]["tokens"] == ["low</w>"] * 2
    assert rows["doc-b"]["tokens"] == ["newest</w>"]


def test_wordpiece_prefers_likelihood_over_raw_count(spark):
    """The planted corpus makes raw-count BPE and likelihood-ratio
    WordPiece disagree on the FIRST merge: (b,</w>) dominates by
    count (every 'b'/'ab' word ends that way) but 'x' and 'y'
    co-occur exclusively — count(xy)/(c(x)c(y)) = 1/3 dwarfs
    count(b</w>)/(c(b)c(</w>))."""
    from product_etl_spark.operators.bpe import train_bpe, train_wordpiece

    texts = ["a"] * 100 + ["b"] * 100 + ["ab"] * 10 + ["xy"] * 3
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    bpe = train_bpe(docs, "text", n_merges=1)
    wp = train_wordpiece(docs, "text", n_merges=1)
    assert bpe[0] != wp[0]
    assert wp[0] == ("x", "y")


def test_wordpiece_deterministic(spark):
    from product_etl_spark.operators.bpe import train_wordpiece

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(["spark scan hash"] * 4 + ["scan ok"])],
        "doc_id long, text string",
    )
    assert train_wordpiece(docs, "text", n_merges=8) == train_wordpiece(
        docs, "text", n_merges=8
    )


def test_maxmunch_longest_first_and_roundtrip(spark):
    from product_etl_spark.operators.bpe import encode_maxmunch

    docs = spark.createDataFrame(
        [(0, "abcde zq AB")], "doc_id long, text string"
    )
    pieces = {"abc", "ab", "de", "cd"}
    rows = encode_maxmunch(docs, "text", "doc_id", pieces).collect()
    toks = rows[0]["tokens"]
    # greedy longest at pos 0 takes 'abc' (not 'ab' — so 'cd' never
    # matches), then 'de' aligns; unknown word 'zq' falls back to
    # chars; 'AB' lowercases like the trainers and matches 'ab'
    assert toks == ["abc", "de", "z", "q", "ab"]
    assert rows[0]["n_tokens"] == len(toks)


def test_merges_to_pieces_strips_eow(spark):
    from product_etl_spark.operators.bpe import merges_to_pieces

    pieces = merges_to_pieces([("a", "b"), ("ab", "</w>"), ("c", "d</w>")])
    assert pieces == {"ab", "cd"}
