"""Byte-pair-encoding tokenizer: distributed training + encoding.

The division of labor follows Sennrich et al. (2016) and every
production tokenizer trainer: BPE training operates on the WORD
FREQUENCY dictionary, not the corpus — so Spark does the one thing
that is corpus-scale (a groupBy word count over 100 TB) and the merge
loop runs driver-side over the vocab-sized dict (hundreds of
thousands of entries, megabytes). Encoding then distributes again:
the learned merge ranks broadcast to an Arrow-batched mapInPandas
stage that applies greedy lowest-rank merging per word.

This replaces approximations (``text.bpe_ish_token_count`` counts
regex pieces) with the real algorithm: learned merges, exact token
sequences, a persistable vocabulary.

Scale shape: train = one shuffle (word count) + a driver loop whose
cost is O(vocab x n_merges) and independent of corpus size; encode =
map-only with a kilobyte-to-megabyte broadcast; per-word results are
memoized per batch (Zipf makes the cache hit rate enormous).
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from product_etl_spark.functions import text as T

#: end-of-word sentinel — one SYMBOL (never split into characters),
#: the classic </w> marker
_EOW = "</w>"


def word_counts(
    df: DataFrame,
    text_col: str,
    min_count: int = 1,
    max_words: int | None = None,
) -> DataFrame:
    """(word, n) over the corpus — the only corpus-scale stage.

    ``min_count`` floors the frequency (hash-agg side, before any
    collect); ``max_words`` keeps only the top-N words by (n desc,
    word asc) via a rank that Spark executes as TakeOrdered-style
    pruning. Both bound what ``train_bpe`` materializes on the driver:
    on 100 TB web text distinct tokens reach 1e8-1e9 (tens of GB
    collected), while the words ABOVE any useful floor are Zipf-bounded
    (~1e6). Dropping sub-floor words removes only tail count mass from
    each pair total; merges whose winning margins exceed that mass are
    unchanged — the standard trainer trade-off (subword-nmt's
    --min-frequency, SentencePiece's pruning). Exactness on a fixture
    corpus with/without the floor is asserted in
    test_bpe.py::test_min_count_floor_preserves_merges.
    """
    wc = (
        df.select(F.explode(T.tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_count > 1:
        wc = wc.filter(F.col("n") >= F.lit(min_count))
    if max_words is not None:
        # deterministic top-N: highest count first, lexicographic tiebreak
        wc = (
            wc.orderBy(F.col("n").desc(), F.col("word").asc())
            .limit(max_words)
        )
    return wc


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int = 200,
    min_pair_count: int = 2,
    min_count: int = 1,
    max_words: int | None = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the
    ordered merge list (rank = position). Deterministic: pair-count
    ties break lexicographically.

    Driver-memory bound: the collect below materializes at most
    ``max_words`` (default 1M ≈ tens of MB) rows, after the
    ``min_count`` frequency floor — never the raw distinct-token count
    of the corpus. Raise ``max_words``/drop the floor only for
    small-corpus exact parity runs.
    """
    vocab = {
        r["word"]: r["n"]
        for r in word_counts(
            df, text_col, min_count=min_count, max_words=max_words
        ).collect()
    }
    # symbol sequences per word, driver-side (vocab-sized); the
    # end-of-word marker is a single symbol
    seqs = {w: tuple(w) + (_EOW,) for w in vocab}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for w, seq in seqs.items():
            n = vocab[w]
            for a, b in zip(seq, seq[1:]):
                pair_counts[(a, b)] += n
        if not pair_counts:
            break
        # deterministic tiebreak: highest count, then lexicographically
        # smallest pair
        top = max(pair_counts.values())
        best = min(p for p, c in pair_counts.items() if c == top)
        if pair_counts[best] < min_pair_count:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        new_seqs = {}
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs[w] = tuple(out)
        seqs = new_seqs
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    seq = list(word) + [_EOW]
    while len(seq) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(seq, seq[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        seq[best_i:best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def encode_bpe(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) — greedy lowest-rank BPE
    applied per word. Broadcast ranks + Arrow-batched mapInPandas;
    per-word memoization inside each batch (Zipf: most words repeat).
    """
    import pandas as pd

    spark = df.sparkSession
    b_ranks = spark.sparkContext.broadcast(
        {pair: i for i, pair in enumerate(merges)}
    )

    import re

    # Training tokenizes with Spark's split on Java-regex \s+ (ASCII
    # whitespace). Python's str.split() splits on UNICODE whitespace
    # (NBSP, thin space — common in scraped text), which would produce
    # words the model never saw. re.ASCII pins the kernel to the same
    # token boundaries the trainer used.
    _ws = re.compile(r"\s+", re.ASCII)

    def run(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        ranks = b_ranks.value
        cache: dict[str, list[str]] = {}
        for pdf in it:
            toks_col, counts = [], []
            for text in pdf["_text"]:
                toks: list[str] = []
                for word in filter(None, _ws.split((text or "").lower())):
                    got = cache.get(word)
                    if got is None:
                        got = cache[word] = _encode_word(word, ranks)
                    toks.extend(got)
                toks_col.append(toks)
                counts.append(len(toks))
            yield pd.DataFrame(
                {"_id": pdf["_id"], "tokens": toks_col, "n_tokens": counts}
            )

    # the id column keeps its real type (string ids are common for
    # document tables) — hardcoding `long` here would fail or null-out
    # at Arrow conversion for non-long ids
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("_id", df.schema[id_col].dataType),
            StructField("tokens", ArrayType(StringType())),
            StructField("n_tokens", IntegerType()),
        ]
    )
    out = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    ).mapInPandas(run, schema=out_schema)
    return out.select(
        F.col("_id").alias(id_col), "tokens", "n_tokens"
    )


def train_wordpiece(
    df: DataFrame,
    text_col: str,
    n_merges: int = 200,
    min_pair_count: int = 2,
    min_count: int = 1,
    max_words: int | None = 1_000_000,
) -> list[tuple[str, str]]:
    """WordPiece-scored merges (Schuster & Nakajima 2012; the BERT
    trainer): identical loop to ``train_bpe`` but the winning pair
    maximizes the LIKELIHOOD RATIO count(ab) / (count(a)·count(b))
    instead of the raw pair count — merging symbols that co-occur
    more than their individual frequencies predict, which resists the
    BPE failure mode of gluing ubiquitous symbols first. Completes
    the tokenizer-trainer triad (BPE q50 / unigram-LM q188 /
    WordPiece).

    Engine-exact determinism without floats: scores are compared by
    integer CROSS-MULTIPLICATION — s1 > s2 iff
    c_ab1·c_a2·c_b2 > c_ab2·c_a1·c_b1 (Python ints, no overflow, no
    division) — ties break to the lexicographically smallest pair.
    Same scale shape as train_bpe: one corpus word-count shuffle,
    then a driver loop over the Zipf-bounded dict. The returned merge
    list feeds ``encode_bpe`` (greedy lowest-rank) or
    ``merges_to_pieces`` + ``encode_maxmunch`` (the WordPiece
    longest-match-first runtime)."""
    vocab = {
        r["word"]: r["n"]
        for r in word_counts(
            df, text_col, min_count=min_count, max_words=max_words
        ).collect()
    }
    seqs = {w: tuple(w) + (_EOW,) for w in vocab}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        sym_counts: Counter = Counter()
        for w, seq in seqs.items():
            n = vocab[w]
            for s in seq:
                sym_counts[s] += n
            for a, b in zip(seq, seq[1:]):
                pair_counts[(a, b)] += n
        if not pair_counts:
            break
        best = None
        best_c = 0
        for p, c in pair_counts.items():
            if c < min_pair_count:
                continue
            if best is None:
                best, best_c = p, c
                continue
            lhs = c * sym_counts[best[0]] * sym_counts[best[1]]
            rhs = best_c * sym_counts[p[0]] * sym_counts[p[1]]
            if lhs > rhs or (lhs == rhs and p < best):
                best, best_c = p, c
        if best is None:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        new_seqs = {}
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs[w] = tuple(out)
        seqs = new_seqs
    return merges


def merges_to_pieces(merges: list[tuple[str, str]]) -> set[str]:
    """The piece inventory a merge list induces: every merged symbol
    (single characters always segment as themselves in
    ``encode_maxmunch``, so they need no explicit entry). The
    ``_EOW`` sentinel is stripped — max-munch operates on raw words."""
    return {
        (a + b).replace(_EOW, "") for a, b in merges if (a + b) != _EOW
    } - {""}


def encode_maxmunch(
    df: DataFrame,
    text_col: str,
    id_col: str,
    pieces: set[str],
) -> DataFrame:
    """(id, tokens, n_tokens) — greedy LONGEST-MATCH-FIRST
    segmentation (the WordPiece/BERT runtime, minus the ``##``
    rendering so that ``''.join(tokens)`` reconstructs each word):
    at every position take the longest piece in the inventory,
    falling back to the single character (characters are implicit
    pieces, so no [UNK] and no unsegmentable words). Broadcast
    inventory + Arrow-batched mapInPandas with per-batch memoization
    — the ``encode_bpe`` shape."""
    import re

    import pandas as pd

    spark = df.sparkSession
    max_len = max((len(p) for p in pieces), default=1)
    b = spark.sparkContext.broadcast((frozenset(pieces), max_len))
    _ws = re.compile(r"\s+", re.ASCII)

    def _munch(word: str, voc, ml: int) -> list[str]:
        out, i, n = [], 0, len(word)
        while i < n:
            step = 1
            for ln in range(min(ml, n - i), 1, -1):
                if word[i : i + ln] in voc:
                    step = ln
                    break
            out.append(word[i : i + step])
            i += step
        return out

    def run(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        voc, ml = b.value
        cache: dict[str, list[str]] = {}
        for pdf in it:
            toks_col, counts = [], []
            for text in pdf["_text"]:
                toks: list[str] = []
                for word in filter(None, _ws.split((text or "").lower())):
                    got = cache.get(word)
                    if got is None:
                        got = cache[word] = _munch(word, voc, ml)
                    toks.extend(got)
                toks_col.append(toks)
                counts.append(len(toks))
            yield pd.DataFrame(
                {"_id": pdf["_id"], "tokens": toks_col, "n_tokens": counts}
            )

    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("_id", df.schema[id_col].dataType),
            StructField("tokens", ArrayType(StringType())),
            StructField("n_tokens", IntegerType()),
        ]
    )
    out = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    ).mapInPandas(run, schema=out_schema)
    return out.select(F.col("_id").alias(id_col), "tokens", "n_tokens")
