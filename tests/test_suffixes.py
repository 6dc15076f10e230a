"""Suffix-array exact-substring dedup (operators/suffixes): brute
force on planted corpora, the identical-tails fast path, within-doc
repetition exclusion, and the module's cross-check contract —
coverage AND merged intervals equal the gram method at n = min_len
(dedup.crossdoc_dup_span_coverage) on fixtures and a real corpus
slice."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from product_etl_spark.operators.dedup import crossdoc_dup_span_coverage
import pytest
from product_etl_spark.operators.suffixes import (
    suffix_dup_coverage,
    suffix_duplicated_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute_spans(corpus: dict, min_len: int) -> list:
    """Reference model: for every position, the longest prefix of its
    tail occurring contiguously in a DIFFERENT doc; merge [p, p+d)
    islands with d >= min_len. O(everything) — fixtures only."""

    def occurs(needle, did):
        for o, toks in corpus.items():
            if o == did:
                continue
            for i in range(len(toks) - len(needle) + 1):
                if toks[i : i + len(needle)] == needle:
                    return True
        return False

    out = []
    for did, toks in sorted(corpus.items()):
        ivs = []
        for p in range(len(toks)):
            d = 0
            for L in range(len(toks) - p, 0, -1):
                if occurs(toks[p : p + L], did):
                    d = L
                    break
            if d >= min_len:
                ivs.append((p, p + d))
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        out.extend((did, s, e - s) for s, e in merged)
    return out


def _spark_spans(spark, rows, min_len, method="blocked"):
    return [
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in suffix_duplicated_spans(
            _docs(spark, rows), "text", "doc_id", min_len=min_len,
            method=method,
        ).collect()
    ]


def test_planted_long_span_true_length(spark):
    """Two docs share a verbatim 10-token run; min_len=8 must report
    ONE maximal span of TRUE length 10 in each (the arbitrary-length
    upgrade over fixed-n grams), and the clean doc reports none."""
    shared = " ".join(f"s{i}" for i in range(10))
    rows = [
        (1, f"x1 x2 {shared} x3"),
        (2, f"y1 {shared} y2 y3 y4"),
        (3, "clean words only never repeated anywhere at all"),
    ]
    for method in ("blocked", "doubling"):
        got = _spark_spans(spark, rows, 8, method)
        assert got == [(1, 2, 10), (2, 1, 10)], method
        assert got == _brute_spans(
            {i: t.split() for i, t in rows}, 8
        ), method


def test_within_doc_repetition_does_not_count(spark):
    """A document repeating its own 8-gram twice has NO cross-doc
    duplicated span (min_df-distinct-docs semantics, same as q147)."""
    run = " ".join(f"r{i}" for i in range(8))
    rows = [(1, f"{run} mid {run}"), (2, "totally different content here")]
    assert _spark_spans(spark, rows, 8) == []


def test_identical_docs_full_coverage(spark):
    """Two byte-identical docs: the identical-tails LCP fast path —
    every position's tail matches the other doc, one span covering
    the whole doc each; a third doc sharing only a mid prefix gets
    its true shorter span."""
    body = " ".join(f"w{i}" for i in range(12))
    rows = [(1, body), (2, body), (3, "zz " + " ".join(f"w{i}" for i in range(9)))]
    corpus = {i: t.split() for i, t in rows}
    got = _spark_spans(spark, rows, 8)
    assert got == _brute_spans(corpus, 8)
    assert (1, 0, 12) in got and (2, 0, 12) in got and (3, 1, 9) in got
    cov = {
        r["doc_id"]: (r["covered"], r["coverage"])
        for r in suffix_dup_coverage(
            _docs(spark, rows), "text", "doc_id", min_len=8
        ).collect()
    }
    assert cov[1] == (12, 1.0) and cov[2] == (12, 1.0)
    assert cov[3] == (9, round(9 / 10, 4))


@pytest.mark.slow
def test_brute_force_hash_corpus(spark):
    """Deterministic small-vocab corpus (md5-driven, 8 docs x 30
    tokens over a 12-word vocab — dense accidental repeats): the
    spans surface must equal brute force exactly at two min_lens."""

    def tk(i, j):
        return "t" + str(
            int(hashlib.md5(f"{i},{j}".encode()).hexdigest()[:4], 16) % 12
        )

    rows = [
        (i, " ".join(tk(i, j) for j in range(30))) for i in range(8)
    ]
    corpus = {i: t.split() for i, t in rows}
    for ml in (3, 5):
        want = _brute_spans(corpus, ml)
        for method in ("blocked", "doubling"):
            assert _spark_spans(spark, rows, ml, method) == want, (
                ml,
                method,
            )


def test_coverage_equals_gram_method_on_real_slice(spark, sf_dir):
    """The module contract powering q212's SQL oracle: suffix
    coverage at min_len L == gram coverage at n = L, row for row, on
    a real documents slice."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 150)
        .select("doc_id", "text")
    )
    a = {
        r["doc_id"]: (r["n_tokens"], r["covered"], r["coverage"])
        for r in suffix_dup_coverage(
            docs, "text", "doc_id", min_len=5
        ).collect()
    }
    b = {
        r["doc_id"]: (r["n_tokens"], r["covered"], r["coverage"])
        for r in crossdoc_dup_span_coverage(
            docs, "text", "doc_id", n=5, min_df=2
        ).collect()
    }
    assert a == b and len(a) == 150


def test_blocked_mega_doc_guard(spark):
    """The blocked method's O(len^2) per-doc blow-up is loud-guarded:
    a document over max_doc_tokens FAILS with the switch-to-doubling
    message; doubling happily processes the same corpus."""
    import pytest

    rows = [
        (1, " ".join(f"a{i}" for i in range(30))),
        (2, " ".join(f"a{i}" for i in range(30))),
    ]
    with pytest.raises(Exception, match="doubling"):
        suffix_duplicated_spans(
            _docs(spark, rows), "text", "doc_id", min_len=8,
            max_doc_tokens=10,
        ).collect()
    got = _spark_spans(spark, rows, 8, "doubling")
    assert got == [(1, 0, 30), (2, 0, 30)]


def test_suffix_removal_planted_and_matches_coverage(spark):
    """suffix_remove_duplicates excises the shared run from EVERY
    holder (no keeper — the conservative strip; q177's gram rule
    keeps one), preserves original case, and its n_removed equals
    suffix_dup_coverage's covered count per doc (same position
    set)."""
    from product_etl_spark.operators.suffixes import (
        suffix_remove_duplicates,
    )

    shared = " ".join(f"S{i}" for i in range(10))  # original case kept
    rows = [
        (1, f"x1 x2 {shared} x3"),
        (2, f"y1 {shared.lower()} y2"),  # lowercased match still dups
        (3, "clean words only never repeated anywhere at all"),
    ]
    out = {
        r["doc_id"]: r
        for r in suffix_remove_duplicates(
            _docs(spark, rows), "text", "doc_id", min_len=8
        ).collect()
    }
    assert out[1]["text_clean"] == "x1 x2 x3"
    assert out[2]["text_clean"] == "y1 y2"
    assert out[3]["text_clean"] == rows[2][1]
    assert out[1]["n_removed"] == 10 and out[2]["n_removed"] == 10
    assert out[3]["n_removed"] == 0
    cov = {
        r["doc_id"]: r["covered"]
        for r in suffix_dup_coverage(
            _docs(spark, rows), "text", "doc_id", min_len=8
        ).collect()
    }
    assert all(out[d]["n_removed"] == cov[d] for d in cov)


def _brute_color_cover(corpus, colors, min_len):
    """Reference: per doc, merged cover of [p, p+d) where d = longest
    prefix occurring contiguously in a doc of a DIFFERENT color."""
    out = {}
    for did, toks in sorted(corpus.items()):
        ivs = []
        for p in range(len(toks)):
            d = 0
            for L in range(len(toks) - p, 0, -1):
                hit = False
                for o, ot in corpus.items():
                    if colors[o] == colors[did]:
                        continue
                    for i in range(len(ot) - L + 1):
                        if ot[i : i + L] == toks[p : p + L]:
                            hit = True
                            break
                    if hit:
                        break
                if hit:
                    d = L
                    break
            if d >= min_len:
                ivs.append((p, p + d))
        cov = set()
        for s, e in ivs:
            cov.update(range(s, e))
        out[did] = len(cov)
    return out


def test_cross_source_coverage_brute_and_same_color_invisible(spark):
    """suffix_shared_span_coverage: corpus-vs-benchmark true-span
    contamination. A corpus doc copying ANOTHER CORPUS doc is
    invisible (same color); a corpus doc sharing a run with a
    BENCHMARK doc is covered for exactly that run; brute force
    agrees on every doc for both methods."""
    from product_etl_spark.operators.suffixes import (
        suffix_shared_span_coverage,
    )

    leak = " ".join(f"L{i}" for i in range(9))
    dup = " ".join(f"D{i}" for i in range(12))
    rows = [
        (0, f"bench1 {leak} benchtail"),           # benchmark
        (1, f"c1 {leak} c2 c3"),                   # contaminated corpus
        (2, f"x0 {dup} x1"),                       # corpus-corpus dup pair
        (3, f"y0 y1 {dup}"),                       #   -> must be invisible
        (4, "clean corpus words nothing shared"),  # clean corpus
    ]
    colors = {0: "bench", 1: "corp", 2: "corp", 3: "corp", 4: "corp"}
    df = spark.createDataFrame(
        [(i, t, colors[i]) for i, t in rows],
        "doc_id long, text string, src string",
    )
    want = _brute_color_cover(
        {i: t.split() for i, t in rows}, colors, 8
    )
    for method in ("blocked", "doubling"):
        got = {
            r["doc_id"]: r["covered"]
            for r in suffix_shared_span_coverage(
                df, "text", "doc_id", "src", min_len=8, method=method
            ).collect()
        }
        assert got == want, method
        assert got[1] == 9    # the benchmark leak, true length
        assert got[2] == 0 and got[3] == 0  # same-color dup invisible
        assert got[0] == 9    # benchmark side sees the corpus copy


def test_segmented_running_min_matches_pandas(spark):
    """_segmented_running_min (both directions) == pandas
    groupby-cummin on a deterministic frame whose segments span
    multiple range partitions."""
    import hashlib

    import pandas as pd

    from product_etl_spark.operators.suffixes import (
        _segmented_running_mins,
    )

    rows = []
    for s in range(1, 401):
        seg = 1 + (s - 1) // 97  # segments of 97 rows: cross partitions
        v = int(hashlib.md5(str(s).encode()).hexdigest()[:4], 16) % 100
        rows.append((s, seg, v))
    df = spark.createDataFrame(rows, "_s long, _run long, _lcp long")
    both = _segmented_running_mins(
        df, "_s", "_run", "_lcp", "_fm", "_bm"
    ).collect()
    fwd = {r["_s"]: r["_fm"] for r in both}
    bwd = {r["_s"]: r["_bm"] for r in both}
    pdf = pd.DataFrame(rows, columns=["_s", "_run", "_lcp"])
    exp_f = pdf.groupby("_run")["_lcp"].cummin()
    exp_b = pdf[::-1].groupby("_run")["_lcp"].cummin()[::-1]
    for i, s in enumerate(pdf["_s"]):
        assert fwd[s] == exp_f.iloc[i], ("fwd", s)
        assert bwd[s] == exp_b.iloc[i], ("bwd", s)


def test_segmented_prefix_sum_matches_pandas(spark):
    """_segmented_prefix_sum == pandas groupby-cumsum on a
    deterministic frame whose segments SPAN multiple range partitions
    — the fixture class that caught the reversed-carry bug in the
    running-min scans (tiny planted frames fit one partition and
    never exercise the cross-partition carry)."""
    import hashlib

    import pandas as pd

    from product_etl_spark.operators.suffixes import _segmented_prefix_sum

    rows = []
    for s in range(1, 401):
        seg = 1 + (s - 1) // 97  # segments of 97 rows: cross partitions
        v = int(hashlib.md5(str(s).encode()).hexdigest()[:4], 16) % 100
        rows.append((s, seg, v))
    df = spark.createDataFrame(rows, "_s long, _g long, _v long")
    got = {
        (r["_g"], r["_s"]): r["_cum"]
        for r in _segmented_prefix_sum(df, ["_g"], "_s", "_v", "_cum").collect()
    }
    pdf = pd.DataFrame(rows, columns=["_s", "_g", "_v"])
    exp = pdf.groupby("_g")["_v"].cumsum()
    for i in range(len(pdf)):
        key = (pdf["_g"].iloc[i], pdf["_s"].iloc[i])
        assert got[key] == exp.iloc[i], key


def test_contamination_removal_planted(spark):
    """suffix_remove_contaminated: the benchmark leak is excised from
    the corpus doc (original case kept), corpus-corpus duplication is
    NOT removed (same color), benchmark docs are absent from the
    output, and n_removed matches the cross-color coverage."""
    from product_etl_spark.operators.suffixes import (
        suffix_remove_contaminated,
    )

    leak = " ".join(f"L{i}" for i in range(9))
    dup = " ".join(f"D{i}" for i in range(12))
    rows = [
        (0, f"bench1 {leak.lower()} benchtail", "bench"),
        (1, f"C1 {leak} C2", "corpus"),
        (2, f"x0 {dup} x1", "corpus"),
        (3, f"y0 y1 {dup}", "corpus"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    out = {
        r["doc_id"]: r
        for r in suffix_remove_contaminated(
            df, "text", "doc_id", "src", "corpus", min_len=8
        ).collect()
    }
    assert set(out) == {1, 2, 3}            # benchmark never emitted
    assert out[1]["text_clean"] == "C1 C2"  # leak gone, case kept
    assert out[1]["n_removed"] == 9
    assert out[2]["n_removed"] == 0 and out[3]["n_removed"] == 0
    assert out[2]["text_clean"] == rows[2][1]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=1, max_size=12
        ),
        min_size=2,
        max_size=5,
    ),
    st.integers(min_value=2, max_value=4),
)
def test_property_spans_match_brute(spark, docs, min_len):
    """Property: over tiny 3-letter-alphabet corpora (dense accidental
    repeats, adversarial for run/boundary logic), the blocked spans
    surface equals the brute-force model for any min_len."""
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    corpus = {i: t.split() for i, t in rows}
    assert _spark_spans(spark, rows, min_len) == _brute_spans(
        corpus, min_len
    )


def test_touching_spans_merge_on_both_engines(spark, tmp_path):
    """TOUCHING maximal spans (doc A shares tokens [0,8) with X and
    [8,16) with Y, with NO duplicated 8-gram crossing the boundary)
    are ONE maximal interval of the covered set — [0,16) — and both
    the Spark operator and the q212 ORACLE must say so. Pins the r13
    oracle fix: the island break is now pos > MAX(pos + 8) (exclusive
    ends touch-merge); the old pos > MAX(pos + 7) split touching
    islands and would have hash-mismatched on exactly this corpus."""
    import duckdb

    from product_etl_spark import plans

    s = " ".join(f"s{i}" for i in range(8))
    t = " ".join(f"t{i}" for i in range(8))
    rows = [
        (0, f"{s} {t}"),                         # A: [0,8)+[8,16) touch
        (1, f"x1 x2 x3 x4 x5 x6 x7 x8 {s}"),     # X carries s at pos 8
        (2, f"{t} y1 y2 y3 y4 y5 y6 y7 y8"),     # Y carries t at pos 0
    ]
    docs = _docs(spark, rows)
    got = {
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in suffix_duplicated_spans(docs, "text", "doc_id", 8).collect()
    }
    want = {(0, 0, 16), (1, 8, 8), (2, 0, 8)}
    assert got == want
    # doubling agrees
    assert (
        set(
            (r["doc_id"], r["span_start"], r["span_len"])
            for r in suffix_duplicated_spans(
                docs, "text", "doc_id", 8, method="doubling"
            ).collect()
        )
        == want
    )
    # the ORACLE on the same corpus (DuckDB over a parquet view)
    pq = str(tmp_path / "touch_docs")
    docs.write.mode("overwrite").parquet(pq)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    oracle = plans.oracle_sql()["q212_suffix_duplicated_spans"]
    got_sql = {tuple(r) for r in con.execute(oracle).fetchall()}
    assert got_sql == want
