"""Unigram-LM tokenizer (operators/unigram.py): planted-corpus EM
cases, Viterbi-vs-brute-force, and the integer min-pieces twin that
q188 driver-hashes."""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from product_etl_spark.operators.unigram import (
    candidate_pieces,
    encode_unigram,
    min_pieces_costs,
    train_unigram,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_em_learns_planted_piece(spark):
    """A corpus dominated by 'abab' must keep 'ab' (or 'abab') as a
    high-probability piece through pruning, and Viterbi must stop
    segmenting it into characters."""
    docs = _docs(spark, ["abab abab abab abab abab"] * 20 + ["cd xy"] * 2)
    vocab = train_unigram(
        docs, "text", vocab_size=8, max_piece_len=4, seed_multiplier=4
    )
    pieces = {p for p, _ in vocab}
    assert "ab" in pieces or "abab" in pieces
    toks = {
        r["doc_id"]: r["tokens"]
        for r in encode_unigram(docs, "text", "doc_id", vocab).collect()
    }
    # 5 words of 'abab': at most 2 pieces each, never 4 chars
    assert len(toks[0]) <= 10


def test_em_prunes_rare_piece(spark):
    """Pruning drops low-expected-count multi-char pieces but NEVER
    characters (the unigram invariant)."""
    docs = _docs(spark, ["aaaa aaaa aaaa", "zq"])
    vocab = train_unigram(docs, "text", vocab_size=3, max_piece_len=3)
    pieces = {p for p, _ in vocab}
    # every corpus character survives
    assert {"a", "z", "q"} <= pieces
    # the rare word's bigram 'zq' is pruned before 'aa'/'aaa'
    assert "zq" not in pieces


def test_train_is_deterministic(spark):
    docs = _docs(spark, ["spark hash join scan", "hash join hash scan"] * 3)
    v1 = train_unigram(docs, "text", vocab_size=12)
    v2 = train_unigram(docs, "text", vocab_size=12)
    assert v1 == v2


def _brute_best_score(word, logp, max_len):
    """Max total logp over ALL segmentations (exponential; test-only)."""
    n = len(word)
    best = -math.inf
    for cuts in itertools.product([0, 1], repeat=n - 1):
        pos = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
        score = 0.0
        ok = True
        for a, b in zip(pos, pos[1:]):
            p = word[a:b]
            if b - a > max_len or p not in logp:
                ok = False
                break
            score += logp[p]
        if ok and score > best:
            best = score
    return best


def test_viterbi_matches_bruteforce(spark):
    docs = _docs(spark, ["abcab cabc ab abc"])
    vocab = train_unigram(docs, "text", vocab_size=10, max_piece_len=3)
    logp = dict(vocab)
    rows = encode_unigram(docs, "text", "doc_id", vocab).collect()
    for word, toks in zip(
        "abcab cabc ab abc".split(),
        _chunks(rows[0]["tokens"], "abcab cabc ab abc".split()),
    ):
        got = sum(logp[t] for t in toks)
        want = _brute_best_score(word, logp, 3)
        assert got == pytest.approx(want, abs=1e-12), (word, toks)


def _chunks(tokens, words):
    """Split a flat token list back into per-word runs."""
    out, it = [], iter(tokens)
    for w in words:
        run, acc = [], ""
        while acc != w:
            t = next(it)
            run.append(t)
            acc += t
        out.append(run)
    return out


def test_encode_unknown_char_fallback_and_nulls(spark):
    docs = _docs(spark, ["ab ##", None, ""])
    vocab = [("ab", math.log(0.9)), ("a", math.log(0.05)), ("b", math.log(0.05))]
    rows = {
        r["doc_id"]: r
        for r in encode_unigram(docs, "text", "doc_id", vocab).collect()
    }
    assert rows[0]["tokens"] == ["ab", "#", "#"]
    assert rows[1]["tokens"] == [] and rows[1]["n_tokens"] == 0
    assert rows[2]["tokens"] == [] and rows[2]["n_tokens"] == 0


def test_min_pieces_matches_bruteforce(spark):
    words = ["abcab", "aaaa", "abc", "a", "zzz"]
    vocab = ["a", "b", "c", "ab", "ca", "abc", "aa"]
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    pdf = spark.createDataFrame([(p,) for p in vocab], "piece string")
    got = {
        r["word"]: r["n_pieces"]
        for r in min_pieces_costs(wdf, pdf).collect()
    }

    def brute(word):
        n = len(word)
        best = None
        for cuts in itertools.product([0, 1], repeat=n - 1):
            pos = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
            ps = [word[a:b] for a, b in zip(pos, pos[1:])]
            if all(p in vocab for p in ps):
                if best is None or len(ps) < best:
                    best = len(ps)
        return best

    for w in words:
        assert got[w] == brute(w), w
    assert got["zzz"] is None  # unsegmentable -> NULL, never a wrong int


def test_min_pieces_vocab_cap_raises(spark):
    wdf = spark.createDataFrame([("ab",)], "word string")
    pdf = spark.createDataFrame(
        [(f"p{i}",) for i in range(50)], "piece string"
    )
    with pytest.raises(ValueError, match="max_vocab_collect"):
        min_pieces_costs(wdf, pdf, max_vocab_collect=10)


def test_candidate_pieces_deterministic_and_char_complete(spark):
    docs = _docs(spark, ["spark spark scan", "hash scan"])
    got = {
        r["piece"] for r in candidate_pieces(docs, "text", top_n=5).collect()
    }
    # every corpus character present
    assert set("sparkschanh") <= got
    # top-N multi-char pieces by weighted occurrences, ties
    # piece-ascending: 'spark'/'scan' substrings all weigh 2 (both
    # words occur twice), 'hash's weigh 1 — the 5 slots go to the
    # lexicographically-first weight-2 pieces
    assert {"an", "ar", "ark", "ca", "can"} <= got
    assert "ha" not in got  # weight-1 pieces lose to weight-2
    again = {
        r["piece"] for r in candidate_pieces(docs, "text", top_n=5).collect()
    }
    assert got == again


def test_distributed_estep_matches_driver(spark):
    """em_expected_counts (distributed E-step: map-only posteriors +
    one vocab-bounded groupBy-sum) must equal the driver-side
    forward-backward loop train_unigram runs, word for word."""
    from collections import defaultdict

    from product_etl_spark.operators.unigram import (
        _forward_backward,
        em_expected_counts,
    )

    docs = _docs(spark, ["abcab cabc ab abc", "ab ab cab"])
    vocab = train_unigram(docs, "text", vocab_size=10, max_piece_len=3)
    logp = dict(vocab)

    from product_etl_spark.operators.unigram import word_counts

    wc = word_counts(docs, "text")
    wdict = {r["word"]: r["n"] for r in wc.collect()}
    want: dict[str, float] = defaultdict(float)
    for w, n in wdict.items():
        _, exp = _forward_backward(w, logp, 3)
        for p, c in exp.items():
            want[p] += n * c

    got = {
        r["piece"]: r["exp_n"]
        for r in em_expected_counts(wc.repartition(4), vocab).collect()
    }
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], rel=1e-12), p


def test_train_and_encode_on_real_documents(spark, sf_dir):
    """The trainer runs on the real documents table (not just planted
    corpora): deterministic vocab, every corpus character kept, and
    the encoded token stream reconstructs each document's words."""
    from product_etl_spark.session import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    v1 = train_unigram(docs, "text", vocab_size=60, max_piece_len=4)
    v2 = train_unigram(docs, "text", vocab_size=60, max_piece_len=4)
    assert v1 == v2 and len(v1) >= 1
    pieces = {p for p, _ in v1}
    enc = encode_unigram(docs, "text", "doc_id", v1)
    row = enc.join(
        docs.select("doc_id", "text"), "doc_id"
    ).orderBy("doc_id").first()
    words = (row["text"] or "").lower().split()
    assert "".join(row["tokens"]) == "".join(words)
    assert all(t in pieces or len(t) == 1 for t in row["tokens"])
