"""Record linkage (operators/linkage.py): blocked pair generation,
edit-distance matching, and transitive entity resolution on planted
clusters."""

from __future__ import annotations

from pyspark.sql import functions as F

from product_etl_spark.operators.linkage import (
    blocked_pairs,
    edit_distance_pairs,
    resolve_entities,
)


def _records(spark):
    # Three spellings of one product (chain: A~B at dist 1, B~C at
    # dist 1, A~C at dist 2), one unrelated record in the same block,
    # one record alone in another block, and one with a NULL block.
    rows = [
        (1, "golden lavender chiffon", "blk1"),
        (2, "goldenn lavender chiffon", "blk1"),
        (3, "goldenn lavender chiffonx", "blk1"),
        (4, "midnight rose steel plum", "blk1"),
        (5, "antique azure snow", "blk2"),
        (6, "whatever", None),
    ]
    return spark.createDataFrame(rows, ["rid", "name", "blk"])


def test_blocked_pairs_within_block_only_and_null_blocks_never_pair(spark):
    df = _records(spark)
    pairs = blocked_pairs(df, "rid", ["blk"], carry_cols=["name"]).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    # all C(4,2)=6 pairs of blk1; record 5 alone; record 6 unblocked
    assert ids == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}
    for r in pairs:  # carried fields are aligned with the ids
        assert r["name_a"] != r["name_b"]


def test_multi_key_blocking_unions_and_dedups(spark):
    rows = [(1, "a", "x", "p"), (2, "b", "x", "p"), (3, "c", "y", "p")]
    df = spark.createDataFrame(rows, ["rid", "name", "blk1", "blk2"])
    pairs = blocked_pairs(df, "rid", ["blk1", "blk2"], ["name"])
    ids = sorted((r["id_a"], r["id_b"]) for r in pairs.collect())
    # (1,2) co-blocked under BOTH keys must appear once; blk2 adds
    # the cross pairs with 3
    assert ids == [(1, 2), (1, 3), (2, 3)]


def test_edit_distance_pairs_threshold(spark):
    df = _records(spark)
    matched = edit_distance_pairs(df, "rid", "name", ["blk"], max_dist=2)
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in matched.collect()}
    assert got == {(1, 2): 1, (2, 3): 1, (1, 3): 2}


def test_resolve_entities_transitive_closure_and_singletons(spark):
    df = _records(spark)
    # tight threshold: only A~B and B~C pair — closure must still
    # put 1,2,3 in ONE entity (min id), everyone else their own
    out = resolve_entities(df, "rid", "name", ["blk"], max_dist=1)
    ents = {r["rid"]: r["entity_id"] for r in out.collect()}
    assert ents == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 6}
    # every input row survives exactly once
    assert out.count() == 6


def test_resolve_entities_cross_block_matches_via_second_key(spark):
    rows = [
        (1, "alpha beta gamma", "b1", "z9"),
        (2, "alpha beta gamm", "b2", "z9"),  # other block, same zip
    ]
    df = spark.createDataFrame(rows, ["rid", "name", "blk", "zip"])
    one_key = resolve_entities(df, "rid", "name", ["blk"], max_dist=2)
    assert {r["entity_id"] for r in one_key.collect()} == {1, 2}
    two_keys = resolve_entities(df, "rid", "name", ["blk", "zip"], max_dist=2)
    assert {r["entity_id"] for r in two_keys.collect()} == {1}


def test_blocked_pairs_block_expression(spark):
    # blocking key may be an expression (name prefix)
    rows = [(1, "golden a"), (2, "golden b"), (3, "silver a")]
    df = spark.createDataFrame(rows, ["rid", "name"])
    pairs = blocked_pairs(
        df, "rid", [F.substring("name", 1, 6)], ["name"]
    )
    assert {(r["id_a"], r["id_b"]) for r in pairs.collect()} == {(1, 2)}


def test_global_sort_ranks_match_enumeration(spark):
    """Ranks == enumerate(sorted(...)) — and a frame referenced twice
    downstream sees ONE consistent rank assignment (the range
    boundaries are sampled, so the frame is pinned)."""
    import random

    from product_etl_spark.operators.linkage import global_sort_ranks

    rng = random.Random(5)
    rows = [(i, f"k{rng.randint(0, 50):03d}") for i in range(500)]
    df = spark.createDataFrame(rows, "rid int, sk string")
    r = global_sort_ranks(df, ["sk", "rid"], rank_col="rank")
    got = {(x["sk"], x["rid"]): x["rank"] for x in r.collect()}
    want = {
        key: i + 1
        for i, key in enumerate(sorted((sk, rid) for rid, sk in rows))
    }
    assert got == want


def test_sorted_neighborhood_pairs_window_complete(spark):
    """Every record pairs with exactly its w rank-successors (n*w - 
    w*(w+1)/2 pairs total), ranks consistent across the self-join, and
    a typo'd name lands next to its original (the SNM promise where
    equality blocking fails)."""
    from pyspark.sql import functions as F

    from product_etl_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    names = [
        (1, "acme widget deluxe"),
        (2, "acme widget deluxo"),   # typo of 1 -- no exact block key
        (3, "bravo gadget"),
        (4, "bravo gadget mk2"),
        (5, "charlie tool"),
        (6, "delta part"),
    ]
    df = spark.createDataFrame(names, "pid int, name string")
    got = sorted_neighborhood_pairs(
        df, "pid", F.lower(F.col("name")), window=2
    ).collect()
    n, w = len(names), 2
    assert len(got) == n * w - w * (w + 1) // 2
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert (1, 2) in pairs  # the typo pair is adjacent in rank order
    for r in got:
        assert 1 <= r["rank_b"] - r["rank_a"] <= w


def test_woe_binning_ntile_semantics_and_totals(spark):
    """Bin sizes reproduce NTILE's remainder-to-the-front rule; pos/neg
    totals are conserved; WOE sign tracks the bin's class balance."""
    import math

    from pyspark.sql import functions as F

    from product_etl_spark.operators.importance import woe_binning

    # 23 rows, 4 bins -> NTILE sizes [6, 6, 6, 5]; positives cluster
    # in the high-value tail
    rows = [(float(v), v, 1 if v > 15 else 0) for v in range(1, 24)]
    df = spark.createDataFrame(rows, "v double, tb int, pos int")
    out = woe_binning(df, "v", F.col("pos") == 1, "tb", n_bins=4)
    got = {r["bin"]: r for r in out.collect()}
    assert [got[b]["n_rows"] for b in (1, 2, 3, 4)] == [6, 6, 6, 5]
    assert sum(r["n_pos"] for r in got.values()) == 8
    assert sum(r["n_neg"] for r in got.values()) == 15
    assert got[1]["woe"] < 0 < got[4]["woe"]
    # spot-check the smoothed formula on bin 4 (5 rows, all positive)
    tp, tn = 8, 15
    want = math.log(((5 + 0.5) / (tp + 0.5)) / ((0 + 0.5) / (tn + 0.5)))
    assert abs(got[4]["woe"] - round(want, 6)) < 1e-9


def test_agreement_pattern_profile_planted(spark):
    """One block, three records with hand-enumerable patterns:
    (1,2) agree on seg only -> '10'; (1,3) agree on band only ->
    '01'; (2,3) agree on neither -> '00'. Marginals are 1/3 each;
    expected replicates the operator's left-fold float tree."""
    from product_etl_spark.operators.linkage import (
        agreement_pattern_profile,
    )

    df = spark.createDataFrame(
        [(1, 0, "A", 0), (2, 0, "A", 1), (3, 0, "B", 0)],
        "id long, blk int, seg string, band int",
    )
    rows = {
        r["pattern"]: r
        for r in agreement_pattern_profile(
            df, "blk", "id", ["seg", "band"]
        ).collect()
    }
    assert {p: rows[p]["n_pairs"] for p in rows} == {
        "10": 1, "01": 1, "00": 1
    }
    p = 1 / 3
    exp = {
        "10": round((3.0 * p) * (1.0 - p), 6),
        "01": round((3.0 * (1.0 - p)) * p, 6),
        "00": round((3.0 * (1.0 - p)) * (1.0 - p), 6),
    }
    for pat, r in rows.items():
        assert r["expected"] == exp[pat], (pat, r["expected"], exp[pat])
        assert r["lift"] == round(r["n_pairs"] / exp[pat], 6)


def test_agreement_pattern_profile_blocks_bound_pairs(spark):
    """Records in different blocks are never paired — the O(block^2)
    contract: two identical records in different blocks produce no
    pattern row at all."""
    from product_etl_spark.operators.linkage import (
        agreement_pattern_profile,
    )

    df = spark.createDataFrame(
        [(1, 0, "A"), (2, 1, "A")], "id long, blk int, seg string"
    )
    assert (
        agreement_pattern_profile(df, "blk", "id", ["seg"]).count() == 0
    )


def test_global_sort_ranks_empty_input(spark):
    """Empty frames must rank to empty frames (zero-entry create_map
    is VOID-typed — the analysis failure stratified_quota_backfill's
    no-over-group path exposed)."""
    from product_etl_spark.operators.linkage import (
        global_sort_ranks,
        global_sort_ranks_counted,
    )
    from product_etl_spark.operators.suffixes import _prefix_sum

    empty = spark.createDataFrame([], "k long, v long").filter("k > 0")
    ranked, total = global_sort_ranks_counted(empty, ["k"], "_r")
    assert ranked.count() == 0 and total == 0
    assert "_r" in ranked.columns
    assert global_sort_ranks(empty, ["k"], "_r").count() == 0
    assert _prefix_sum(empty, "k", "v", "_cum").count() == 0
