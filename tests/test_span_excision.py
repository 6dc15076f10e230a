"""remove_duplicate_spans (Lee et al. 2022 exact-substring dedup,
removal rung): planted shared spans excised with one canonical copy
kept, equivalence with a brute-force reference on a seeded random
corpus, untouched docs reconstruct verbatim (modulo whitespace)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from product_etl_spark.operators.dedup import remove_duplicate_spans


def _brute(docs: list[tuple[int, str]], n: int = 5, min_df: int = 2):
    """Reference implementation of the operator's exact contract."""
    toks = {d: t.split() for d, t in docs}
    low = {d: [x.lower() for x in t] for d, t in toks.items()}
    gram_docs: dict[tuple, set] = {}
    for d, lt in low.items():
        for i in range(len(lt) - n + 1):
            gram_docs.setdefault(tuple(lt[i : i + n]), set()).add(d)
    keeper = {g: min(ds) for g, ds in gram_docs.items() if len(ds) >= min_df}
    out = {}
    for d, t in toks.items():
        lt = low[d]
        rem: set[int] = set()
        for i in range(len(lt) - n + 1):
            g = tuple(lt[i : i + n])
            if g in keeper and keeper[g] != d:
                rem.update(range(i, i + n))
        kept = [t[i] for i in range(len(t)) if i not in rem]
        out[d] = (" ".join(kept), len(t), len(t) - len(kept))
    return out


def _run(spark, docs, n=5, min_df=2):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["doc_id"]: (r["text_clean"], r["n_tokens"], r["n_removed"])
        for r in remove_duplicate_spans(
            df, "text", "doc_id", n=n, min_df=min_df
        ).collect()
    }


def test_planted_shared_span_excised_keeper_kept(spark):
    span = "the quick brown fox jumps over the lazy dog"
    docs = [
        (1, f"alpha beta {span} gamma delta"),          # keeper (lowest id)
        (2, f"unique two before {span} and after text"),
        (3, f"{span} starts this doc entirely here"),
        (4, "totally novel content with no shared spans at all"),
    ]
    got = _run(spark, docs)
    # keeper keeps the span verbatim
    assert got[1][0] == docs[0][1]
    assert got[1][2] == 0
    # non-keepers lose exactly the span (plus any boundary grams --
    # here the span sits mid-doc with unique context, so exactly it)
    assert span not in got[2][0] and span not in got[3][0]
    assert got[2][0] == "unique two before and after text"
    assert got[3][0] == "starts this doc entirely here"
    assert got[2][2] == got[3][2] == 9  # span token count
    # untouched doc reconstructs verbatim
    assert got[4] == (docs[3][1], 9, 0)


def test_case_insensitive_match_preserves_original_case(spark):
    span_lower = "one two three four five"
    docs = [
        (1, f"{span_lower} tail a b c d"),
        (2, f"x y z w ONE Two three FOUR five"),
    ]
    got = _run(spark, docs)
    # doc 2's span matches case-insensitively and is excised; its
    # unique prefix keeps original case
    assert got[2][0] == "x y z w"
    assert got[2][2] == 5
    assert got[1][2] == 0


def test_equals_brute_force_on_seeded_random_corpus(spark):
    rng = random.Random(417)
    vocab = [f"w{i}" for i in range(10)]
    docs = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40))))
        for d in range(12)
    ]
    for n, min_df in ((3, 2), (5, 2), (4, 3)):
        assert _run(spark, docs, n=n, min_df=min_df) == _brute(
            docs, n=n, min_df=min_df
        ), f"mismatch at n={n}, min_df={min_df}"


def test_short_and_empty_docs_pass_through(spark):
    docs = [(1, "a b c"), (2, "a b c"), (3, ""), (4, None)]
    got = _run(spark, docs, n=5)
    assert got[1] == ("a b c", 3, 0)
    assert got[2] == ("a b c", 3, 0)  # < n tokens: no grams, no dedup
    assert got[3] == ("", 0, 0)
    assert got[4] == ("", 0, 0)


def _brute_within(docs: list[tuple[int, str]], n: int = 5):
    """Reference for remove_repeated_spans_within_doc's contract."""
    out = {}
    for d, t in docs:
        toks = t.split() if t else []
        low = [x.lower() for x in toks]
        first: dict[tuple, int] = {}
        count: dict[tuple, int] = {}
        for i in range(len(low) - n + 1):
            g = tuple(low[i : i + n])
            count[g] = count.get(g, 0) + 1
            first.setdefault(g, i)
        rep = {g for g, c in count.items() if c >= 2}
        covered_any: set[int] = set()
        covered_first: set[int] = set()
        for i in range(len(low) - n + 1):
            g = tuple(low[i : i + n])
            if g in rep:
                covered_any.update(range(i, i + n))
                if first[g] == i:
                    covered_first.update(range(i, i + n))
        rem = covered_any - covered_first
        kept = [toks[i] for i in range(len(toks)) if i not in rem]
        out[d] = (" ".join(kept), len(toks), len(toks) - len(kept))
    return out


def _run_within(spark, docs, n=5):
    from product_etl_spark.operators.dedup import (
        remove_repeated_spans_within_doc,
    )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["doc_id"]: (r["text_clean"], r["n_tokens"], r["n_removed"])
        for r in remove_repeated_spans_within_doc(
            df, "text", "doc_id", n=n
        ).collect()
    }


def test_within_doc_repeated_span_keeps_first_copy(spark):
    chorus = "la la hey hey ho"
    docs = [
        (1, f"verse one text here {chorus} verse two body {chorus} end"),
        (2, "no internal repetition in this document at all ok"),
    ]
    got = _run_within(spark, docs)
    # first chorus survives, second excised
    assert got[1][0] == f"verse one text here {chorus} verse two body end"
    assert got[1][2] == 5
    assert got[2] == (docs[1][1], 9, 0)


def test_within_doc_run_collapses_to_one_copy(spark):
    got = _run_within(spark, [(1, "a a a a a a")], n=3)
    # overlap collapses to the first occurrence exactly, never less
    assert got[1] == ("a a a", 6, 3)


def test_within_equals_brute_force_on_seeded_random_corpus(spark):
    rng = random.Random(1031)
    vocab = [f"w{i}" for i in range(6)]
    docs = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 50))))
        for d in range(12)
    ]
    for n in (3, 4, 5):
        assert _run_within(spark, docs, n=n) == _brute_within(docs, n=n), (
            f"mismatch at n={n}"
        )


def test_incremental_equals_batch_over_union(spark, tmp_path):
    """Ingesting batches in ascending doc-id order must reproduce the
    batch operator exactly: every doc's incremental output equals
    remove_duplicate_spans over the union of all batches."""
    from product_etl_spark.operators.dedup_incremental import (
        incremental_span_excision,
    )

    rng = random.Random(733)
    vocab = [f"w{i}" for i in range(8)]
    docs = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 35))))
        for d in range(15)
    ]
    store = str(tmp_path / "gramstore")
    got = {}
    for lo, hi in ((0, 5), (5, 10), (10, 15)):
        bdf = spark.createDataFrame(docs[lo:hi], "doc_id long, text string")
        out = incremental_span_excision(
            spark, bdf, store, "text", "doc_id", n=4
        )
        got.update(
            {
                r["doc_id"]: (r["text_clean"], r["n_tokens"], r["n_removed"])
                for r in out.collect()
            }
        )
    want = _brute(docs, n=4, min_df=2)
    # the batch contract: every dup gram's keeper is its lowest-id doc
    # == first-seen under ascending ingest; the incremental result for
    # each doc must match the batch result over the full union --
    # except that an incremental batch cannot excise text from docs
    # ALREADY ingested when a later batch introduces the second
    # occurrence (history is immutable; the later copy is excised
    # instead). Under keeper=lowest-id that asymmetry never fires:
    # the keeper is always in the earlier batch.
    assert got == want


def test_incremental_replay_is_idempotent(spark, tmp_path):
    from product_etl_spark.operators.dedup_incremental import (
        incremental_span_excision,
    )

    store = str(tmp_path / "gramstore")
    span = "alpha beta gamma delta epsilon"
    b1 = spark.createDataFrame(
        [(1, f"{span} one two three")], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [(2, f"intro words here {span} outro")], "doc_id long, text string"
    )
    incremental_span_excision(spark, b1, store, "text", "doc_id", n=5)
    first = {
        r["doc_id"]: (r["text_clean"], r["n_removed"])
        for r in incremental_span_excision(
            spark, b2, store, "text", "doc_id", n=5
        ).collect()
    }
    assert first[2] == ("intro words here outro", 5)
    n_rows = spark.read.parquet(store).count()

    # replay batch 2: same cleaned output, store unchanged
    again = {
        r["doc_id"]: (r["text_clean"], r["n_removed"])
        for r in incremental_span_excision(
            spark, b2, store, "text", "doc_id", n=5
        ).collect()
    }
    assert again == first
    assert spark.read.parquet(store).count() == n_rows
    # bucket layout for compaction/erasure
    assert any(
        p.name.startswith("gram_bucket=")
        for p in (tmp_path / "gramstore").iterdir()
        if p.is_dir()
    )


def test_incremental_store_erasure_forgets_keeper(spark, tmp_path):
    """RTBF: erasing a subject's doc id from the gram store removes
    its ownership rows; a later batch re-introducing the span gets to
    keep it (the store has genuinely forgotten)."""
    from product_etl_spark.operators.dedup_incremental import (
        incremental_span_excision,
    )
    from product_etl_spark.operators.erasure import erase_from_stores

    store = str(tmp_path / "gramstore")
    span = "one two three four five"
    b1 = spark.createDataFrame(
        [(1, f"{span} unique tail a")], "doc_id long, text string"
    )
    incremental_span_excision(spark, b1, store, "text", "doc_id", n=5)
    report = erase_from_stores(
        spark,
        spark.createDataFrame([(1,)], "id long"),
        [{"path": store, "id_col": "keep", "partition_by": ["gram_bucket"]}],
    )
    assert report[store] > 0

    b2 = spark.createDataFrame(
        [(9, f"fresh head {span} fresh tail")], "doc_id long, text string"
    )
    out = incremental_span_excision(
        spark, b2, store, "text", "doc_id", n=5
    ).collect()
    assert out[0]["n_removed"] == 0  # doc 9 now keeps the span
    # and doc 9 is the new keeper on record
    keeps = {
        r["keep"]
        for r in spark.read.parquet(store).select("keep").distinct().collect()
    }
    assert 1 not in keeps and 9 in keeps


def test_hard_negative_pairs_contract(spark):
    """Hard negatives: (a) every pair IS an LSH candidate, (b) exact
    jaccard recomputed in python is below the ceiling and matches the
    surfaced value, (c) per-anchor cap and rank ordering hold."""
    from product_etl_spark.operators.dedup import (
        hard_negative_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(9)]
    docs = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 28))))
        for d in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = hard_negative_pairs(df, "text", "doc_id").collect()
    assert got, "seeded corpus should produce hard negatives"

    cand = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(
            minhash_signatures(df, "text", "doc_id", k=8), "doc_id"
        ).collect()
    }

    def shingles(t):
        toks = t.lower().split()
        return {" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)}

    sh = {d: shingles(t) for d, t in docs}
    per_anchor: dict[int, list] = {}
    for r in got:
        a, b = r["id_a"], r["id_b"]
        assert (a, b) in cand, f"({a},{b}) not an LSH candidate"
        ni = len(sh[a] & sh[b])
        un = len(sh[a] | sh[b])
        assert 10 * ni < 3 * un, f"({a},{b}) jaccard above ceiling"
        assert abs(r["jaccard"] - round(ni / un, 4)) < 1e-9
        per_anchor.setdefault(a, []).append((r["rank"], r["jaccard"], b))
    for a, rows in per_anchor.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 3
        # rank order == (jaccard asc, id_b asc)
        assert rows == sorted(rows, key=lambda x: (x[1], x[2]))


def test_stream_span_excision_end_to_end(spark, tmp_path):
    """Streaming twin: batches of json-lines docs are cleaned against
    the gram store; a later drop loses spans the first drop owns, and
    replay (same checkpoint, no new files) changes nothing."""
    import json as _json

    from product_etl_spark.streaming.pipeline import stream_span_excision

    src, out, store, ck = (
        str(tmp_path / d) for d in ("in", "cleaned", "grams", "ck")
    )
    import os

    os.makedirs(src)
    span = "alpha beta gamma delta epsilon"

    def drop(fname, rows):
        with open(f"{src}/{fname}", "w") as f:
            for rid, text in rows:
                f.write(_json.dumps({"doc_id": rid, "text": text}) + "\n")

    drop("b1.jsonl", [(1, f"{span} unique one two")])
    q = stream_span_excision(spark, src, out, store, ck)
    q.awaitTermination()
    drop("b2.jsonl", [(2, f"prefix words here {span} suffix")])
    q = stream_span_excision(spark, src, out, store, ck)
    q.awaitTermination()

    got = {
        r["doc_id"]: (r["text_clean"], r["n_removed"])
        for r in spark.read.parquet(out).collect()
    }
    assert got[1] == (f"{span} unique one two", 0)   # keeper batch
    assert got[2] == ("prefix words here suffix", 5)  # span excised

    # replay: no new files -> no new batches -> outputs unchanged
    q = stream_span_excision(spark, src, out, store, ck)
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 2
