"""profile_columns / snapshot_diff unit tests (cross-engine parity is
q129/q130)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from product_etl_spark.operators.profile import profile_columns, snapshot_diff


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")],
        "x int, s string",
    )
    got = {r["column"]: r for r in profile_columns(df, ["x", "s"]).collect()}
    assert got["x"]["n_rows"] == 4
    assert got["x"]["n_nulls"] == 1
    assert got["x"]["n_distinct"] == 2
    assert got["x"]["min_str"] == "1" and got["x"]["max_str"] == "2"
    assert got["s"]["n_nulls"] == 1 and got["s"]["n_distinct"] == 2
    with pytest.raises(ValueError, match="at least one"):
        profile_columns(df, [])
    with pytest.raises(ValueError, match="unknown columns"):
        profile_columns(df, ["nope"])
    # two passes (plain stats + distincts), never a scan per column
    plan = profile_columns(df, ["x", "s"])._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan ExistingRDD") == 2


def test_snapshot_diff_classifies_and_nulls_differ_from_literal(spark):
    old = spark.createDataFrame(
        [(1, "x", 1.0), (2, None, 2.0), (3, "z", 3.0), (4, "NULL", 4.0)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "x", 1.0),      # unchanged -> absent
         (2, "NULL", 2.0),   # NULL -> literal 'NULL' string = CHANGED
         (4, "NULL", 4.5),   # value change
         (5, "new", 5.0)],   # added
        "k int, s string, v double",
    )
    got = {r["k"]: r["change"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "changed", 5: "added"}
    with pytest.raises(ValueError, match="key columns"):
        snapshot_diff(old, new, [])
    with pytest.raises(ValueError, match="no columns"):
        snapshot_diff(old.select("k"), new.select("k"), ["k"])


def test_profile_drift_findings(spark):
    from product_etl_spark.operators.profile import profile_drift

    base_df = spark.createDataFrame(
        [(i, f"v{i}", "seg") for i in range(100)], "k int, s string, seg string"
    )
    # current: s nulled out for 30%, seg collapsed to one value (it
    # already is), k intact; column s2 added, seg removed
    cur_df = spark.createDataFrame(
        [(i, None if i < 30 else f"v{i}", i % 2) for i in range(100)],
        "k int, s string, s2 int",
    )
    b = profile_columns(base_df, ["k", "s", "seg"])
    c = profile_columns(cur_df, ["k", "s", "s2"])
    got = {r["column"]: r["finding"] for r in profile_drift(b, c).collect()}
    assert got == {
        "s": "null_rate_jump",
        "seg": "column_removed",
        "s2": "column_added",
    }
    # distinct collapse: constant-fill bug in k
    bad = spark.createDataFrame([(7, "x") for _ in range(100)], "k int, s string")
    c2 = profile_columns(bad, ["k"])
    got2 = {r["column"]: r["finding"] for r in profile_drift(
        profile_columns(base_df, ["k"]), c2
    ).collect()}
    assert got2 == {"k": "distinct_collapse"}


def test_rank_sum_test_hand_computed(spark):
    """Mann-Whitney with ties, pinned by hand: groups A=[1,2,2,5],
    B=[2,3,4] -> midranks 1:(1), 2:(3,3,3), 3:(5), 4:(6), 5:(7);
    R_A = 1+3+3+7 = 14, U_A = 14 - 4*5/2 = 4, U_B = 12-4 = 8."""
    from product_etl_spark.operators.profile import rank_sum_test

    rows = [(1.0, "A"), (2.0, "A"), (2.0, "A"), (5.0, "A"),
            (2.0, "B"), (3.0, "B"), (4.0, "B")]
    df = spark.createDataFrame(rows, "v double, g string")
    r = rank_sum_test(df, "v", "g", "A", "B").collect()[0]
    assert (r["n_a"], r["n_b"]) == (4, 3)
    assert r["r2_a"] == 28          # 2*R_A
    assert r["u2_a"] == 8           # 2*U_A
    assert r["u2_b"] == 16          # 2*U_B
    # tie-corrected z: var = na*nb/12 * ((n+1) - (t^3-t)/(n(n-1)))
    #  = 12/12 * (8 - 24/42) = 7.428571...; z = (4-6)/sqrt(var)
    import math

    var = 1.0 * (8 - 24 / 42.0)
    assert abs(r["z"] - round((4 - 6) / math.sqrt(var), 6)) < 1e-9
    # Cliff's delta = 2*U_A/(n_a*n_b) - 1 = 8/12 - 1
    assert abs(r["cliffs_delta"] - round(8 / 12.0 - 1, 6)) < 1.1e-6


def test_rank_sum_test_symmetry(spark):
    """Swapping the groups flips z and cliffs_delta signs and swaps
    u2_a/u2_b — the consistency property a wrong cum/tie term breaks."""
    from product_etl_spark.operators.profile import rank_sum_test

    rows = [(float(i % 17), "A" if i % 3 else "B") for i in range(60)]
    df = spark.createDataFrame(rows, "v double, g string")
    ab = rank_sum_test(df, "v", "g", "A", "B").collect()[0]
    ba = rank_sum_test(df, "v", "g", "B", "A").collect()[0]
    assert ab["u2_a"] == ba["u2_b"] and ab["u2_b"] == ba["u2_a"]
    assert abs(ab["z"] + ba["z"]) < 2e-6
    assert abs(ab["cliffs_delta"] + ba["cliffs_delta"]) < 2e-6


def test_spearman_corr_hand_computed(spark):
    """Monotone data -> rho 1; reversed -> -1; a tie-heavy fixture
    pinned against the closed form computed by hand with midranks."""
    from product_etl_spark.operators.profile import spearman_corr

    mono = [(float(i), float(i * i), "G") for i in range(10)]
    rev = [(float(i), float(-i), "G") for i in range(10)]
    df = spark.createDataFrame(mono, "x double, y double, g string")
    assert spearman_corr(df, "x", "y", "g").collect()[0]["rho"] == 1.0
    df = spark.createDataFrame(rev, "x double, y double, g string")
    assert spearman_corr(df, "x", "y", "g").collect()[0]["rho"] == -1.0
    # ties: x = [1,1,2,3], y = [10,20,20,30]
    # doubled midranks x: [3,3,6,8]; y: [2,5,5,8]
    # pearson over (3,2),(3,5),(6,5),(8,8):
    #  n=4 Sx=20 Sy=20 Sxx=118 Syy=118 Sxy=115
    #  num = 4*115-400 = 60; den = sqrt((472-400)(472-400)) = 72
    # (= scipy's 0.833333 on midranks [1.5,1.5,3,4] / [1,2.5,2.5,4])
    rows = [(1.0, 10.0, "G"), (1.0, 20.0, "G"), (2.0, 20.0, "G"), (3.0, 30.0, "G")]
    df = spark.createDataFrame(rows, "x double, y double, g string")
    got = spearman_corr(df, "x", "y", "g").collect()[0]["rho"]
    assert abs(got - round(60 / 72.0, 6)) < 1.1e-6


def test_spearman_corr_grouped_independent(spark):
    """Groups rank independently: a group's rho is unaffected by the
    other group's values (the per-group midrank contract)."""
    from product_etl_spark.operators.profile import spearman_corr

    a = [(float(i), float(i), "A") for i in range(8)]
    b = [(float(i), float((i * 3) % 8), "B") for i in range(8)]
    df = spark.createDataFrame(a + b, "x double, y double, g string")
    both = {r["g"]: r["rho"] for r in spearman_corr(df, "x", "y", "g").collect()}
    only_b = spark.createDataFrame(b, "x double, y double, g string")
    alone = spearman_corr(only_b, "x", "y", "g").collect()[0]["rho"]
    assert both["A"] == 1.0 and both["B"] == alone


def test_spearman_corr_spans_range_partitions(spark):
    """Few groups x many distinct values, pinned against scipy-style
    rank Pearson computed in pandas — the data SPANS range partitions
    so the segmented prefix sum's cross-partition carry is exercised
    (the fixture class that caught the reversed-carry bug)."""
    import hashlib

    import pandas as pd

    from product_etl_spark.operators.profile import spearman_corr

    rows = []
    for i in range(600):
        g = "A" if i % 2 else "B"
        x = float(int(hashlib.md5(f"x{i}".encode()).hexdigest()[:6], 16) % 211)
        y = float(int(hashlib.md5(f"y{i}".encode()).hexdigest()[:6], 16) % 173)
        rows.append((x, x + y if g == "A" else y, g))
    df = spark.createDataFrame(rows, "x double, y double, g string")
    got = {r["g"]: r["rho"] for r in spearman_corr(df, "x", "y", "g").collect()}
    pdf = pd.DataFrame(rows, columns=["x", "y", "g"])
    for g, sub in pdf.groupby("g"):
        rx, ry = sub["x"].rank(), sub["y"].rank()
        exp = rx.corr(ry)  # pearson over midranks == spearman
        assert abs(got[g] - round(exp, 6)) < 2e-6, g


def test_spearman_corr_no_per_group_data_window(spark):
    """Scale guard (r13 verdict item 2): every window in the plan
    carries _pid — either partitioned by (_pid, group) over the data
    rows, or the #partitions-bounded carry window ordered by _pid.
    A window partitioned by the group alone over data rows (one task
    per group) must not reappear."""
    import re

    from product_etl_spark.operators.profile import spearman_corr

    rows = [(float(i), float(i * 2 % 7), "G") for i in range(50)]
    df = spark.createDataFrame(rows, "x double, y double, g string")
    plan = (
        spearman_corr(df, "x", "y", "g")
        ._jdf.queryExecution().executedPlan().toString()
    )
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    bad = [s for s in specs if "_pid" not in s]
    assert not bad, f"window without _pid (single-task group window): {bad}"


def test_rank_tests_degenerate_null_contract(spark):
    """Degenerate corpora emit NULL by explicit guard on BOTH engines
    (ADVICE r13), never an engine-specific NaN/inf: a missing group
    -> z and cliffs_delta NULL; all observations tied -> z NULL but
    cliffs_delta 0; zero rank variance -> rho NULL."""
    from product_etl_spark.operators.profile import (
        rank_sum_test,
        spearman_corr,
    )

    # group B absent entirely
    only_a = spark.createDataFrame(
        [(1.0, "A"), (2.0, "A")], "v double, g string"
    )
    r = rank_sum_test(only_a, "v", "g", "A", "B").collect()[0]
    assert (r["n_a"], r["n_b"]) == (2, 0)
    assert r["z"] is None and r["cliffs_delta"] is None
    # every observation tied: zero variance
    tied = spark.createDataFrame(
        [(5.0, "A"), (5.0, "A"), (5.0, "B")], "v double, g string"
    )
    r = rank_sum_test(tied, "v", "g", "A", "B").collect()[0]
    assert r["z"] is None and r["cliffs_delta"] == 0.0
    # constant y within the group: zero rank variance -> NULL rho
    const_y = spark.createDataFrame(
        [(1.0, 9.0, "G"), (2.0, 9.0, "G"), (3.0, 9.0, "G")],
        "x double, y double, g string",
    )
    r = spearman_corr(const_y, "x", "y", "g").collect()[0]
    assert r["n"] == 3 and r["rho"] is None


def test_rank_tests_drop_null_values(spark):
    """NULL values carry no rank (complete observations): the engines
    disagree on NULL sort order inside windows, so both rank ops drop
    them — a corpus with nulls must score exactly like the corpus
    without them."""
    from product_etl_spark.operators.profile import (
        rank_sum_test,
        spearman_corr,
    )

    clean = [(1.0, 10.0, "A"), (2.0, 20.0, "A"), (3.0, 15.0, "B"), (4.0, 40.0, "B")]
    noisy = clean + [(None, 5.0, "A"), (None, None, "B")]
    dc = spark.createDataFrame(clean, "x double, y double, g string")
    dn = spark.createDataFrame(noisy, "x double, y double, g string")
    rc = rank_sum_test(dc, "x", "g", "A", "B").collect()[0]
    rn = rank_sum_test(dn, "x", "g", "A", "B").collect()[0]
    assert (rn["n_a"], rn["n_b"], rn["r2_a"], rn["u2_a"]) == (
        rc["n_a"], rc["n_b"], rc["r2_a"], rc["u2_a"]
    )
    sc = spearman_corr(dc, "x", "y", "g").collect()
    sn = spearman_corr(dn, "x", "y", "g").collect()
    assert [(r["g"], r["n"], r["rho"]) for r in sc] == [
        (r["g"], r["n"], r["rho"]) for r in sn
    ]


def test_kruskal_wallis_hand_computed(spark):
    """Three groups pinned by hand (scipy.stats.kruskal cross-checked
    formula): A=[1,2], B=[3,4], C=[5,6] -> no ties, ranks 1..6,
    R_A=3, R_B=7, R_C=11; H = 12/(6*7) * (9/2+49/2+121/2) - 21
    = 2/7*89.5/... = 12/42*89.5 - 21 = 4.5714286."""
    from product_etl_spark.operators.profile import (
        kruskal_wallis,
        kruskal_wallis_h,
    )

    rows = [(1.0, "A"), (2.0, "A"), (3.0, "B"), (4.0, "B"),
            (5.0, "C"), (6.0, "C")]
    df = spark.createDataFrame(rows, "v double, g string")
    per = {r["g"]: (r["n_g"], r["r2_g"]) for r in
           kruskal_wallis(df, "v", "g").collect()}
    assert per == {"A": (2, 6), "B": (2, 14), "C": (2, 22)}
    h = kruskal_wallis_h(df, "v", "g").collect()[0]
    assert (h["n"], h["k"], h["ties"]) == (6, 3, 0)
    import math

    want = 12.0 / (6 * 7) * (1.5 ** 2 * 2 + 3.5 ** 2 * 2 + 5.5 ** 2 * 2) - 21
    assert math.isclose(h["h"], round(want, 6), abs_tol=2e-6)
    assert h["h_tc"] == h["h"]  # no ties -> correction is identity


def test_kruskal_wallis_ties_and_degenerate(spark):
    """Tie correction pinned by hand on a tied fixture; all-tied and
    empty inputs follow the NULL contract."""
    from product_etl_spark.operators.profile import kruskal_wallis_h

    # A=[1,1], B=[1,2]: doubled midranks of 1 -> 2*cum-cnt+1 = 2*3-3+1=4
    # (midrank 2), of 2 -> 2*4-1+1=8 (rank 4). r2_A=8, r2_B=12.
    rows = [(1.0, "A"), (1.0, "A"), (1.0, "B"), (2.0, "B")]
    df = spark.createDataFrame(rows, "v double, g string")
    h = kruskal_wallis_h(df, "v", "g").collect()[0]
    assert h["ties"] == 24  # 3^3-3
    import math

    # R_A = 4 (2+2), R_B = 6 (2+4); H = 12/(4*5)*(16/2+36/2) - 15 = 0.6
    want_h = 12.0 / 20 * (8 + 18) - 15
    assert math.isclose(h["h"], round(want_h, 6), abs_tol=2e-6)
    assert math.isclose(h["h_tc"], round(want_h / (1 - 24 / 60.0), 6),
                        abs_tol=2e-6)
    # all observations tied: ties == n^3-n -> h_tc NULL
    tied = spark.createDataFrame(
        [(7.0, "A"), (7.0, "B"), (7.0, "B")], "v double, g string"
    )
    ht = kruskal_wallis_h(tied, "v", "g").collect()[0]
    assert ht["h_tc"] is None
    # NULL values/groups dropped; k=2 groups still fine
    noisy = spark.createDataFrame(
        rows + [(None, "A"), (9.0, None)], "v double, g string"
    )
    hn = kruskal_wallis_h(noisy, "v", "g").collect()[0]
    assert (hn["n"], hn["h"]) == (h["n"], h["h"])


def test_chi_square_independence_matches_pandas(spark):
    """Chi-squared + Cramer's V pinned against a pandas crosstab
    replay (per-cell ROUND policy applied to both), including the
    zero-cell contribution and the NULL-drop stance."""
    import pandas as pd

    from product_etl_spark.operators.profile import chi_square_independence

    rows = [
        (i, ["x", "y", "z"][i % 3] if i % 11 else None,
         ["p", "q"][(i * 7) % 2])
        for i in range(400)
    ]
    # plant a zero cell: no ('z', 'q') observations
    rows = [
        (i, a, "p" if a == "z" else b) for i, a, b in rows
    ]
    df = spark.createDataFrame(rows, "id long, a string, b string")
    got = chi_square_independence(df, "a", "b").collect()[0]

    pdf = pd.DataFrame(rows, columns=["id", "a", "b"]).dropna()
    ct = pd.crosstab(pdf.a, pdf.b)
    n = int(ct.values.sum())
    chi2 = 0.0
    for ai in ct.index:
        for bi in ct.columns:
            o, r, c = int(ct.loc[ai, bi]), int(ct.loc[ai].sum()), int(ct[bi].sum())
            chi2 += round((o * n - r * c) ** 2 / (n * r * c), 6)
    assert got["n"] == n
    assert got["dof"] == (len(ct.index) - 1) * (len(ct.columns) - 1)
    assert abs(got["chi2"] - chi2) < 1e-9
    import math

    assert got["cramers_v"] == round(
        math.sqrt(chi2 / (n * min(len(ct.index) - 1, len(ct.columns) - 1))), 6
    )


def test_chi_square_degenerate_single_category(spark):
    """dof = 0 (one column single-valued): chi2 is 0 and cramers_v is
    NULL — by guard, not by engine-specific 0/0."""
    from product_etl_spark.operators.profile import chi_square_independence

    df = spark.createDataFrame(
        [(i, "only", ["p", "q"][i % 2]) for i in range(20)],
        "id long, a string, b string",
    )
    r = chi_square_independence(df, "a", "b").collect()[0]
    assert r["dof"] == 0 and r["chi2"] == 0.0 and r["cramers_v"] is None


def test_welch_t_matches_pandas_and_degenerates(spark):
    """Welch t/df pinned against the numpy replay of the same trees;
    n < 2 on either side and zero variance yield NULL by guard."""
    from product_etl_spark.operators.profile import welch_t_test

    rows = [(i, ["g1", "g2"][i % 2], float((i * 13) % 40) + 0.25)
            for i in range(300)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = welch_t_test(df, "v", "g", "g1", "g2").collect()[0]

    import numpy as np

    a = np.array([v for _, g, v in rows if g == "g1"])
    b = np.array([v for _, g, v in rows if g == "g2"])
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / len(a) + vb / len(b)
    t = (a.mean() - b.mean()) / np.sqrt(se2)
    dfw = se2 ** 2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert got["n_a"] == len(a) and got["n_b"] == len(b)
    assert abs(got["t"] - round(float(t), 6)) < 1e-6
    assert abs(got["df_welch"] - round(float(dfw), 6)) < 1e-6

    # degenerate: singleton group -> NULL t/df, counts still report
    tiny = spark.createDataFrame(
        [(1, "g1", 5.0), (2, "g2", 1.0), (3, "g2", 2.0)],
        "id long, g string, v double",
    )
    r = welch_t_test(tiny, "v", "g", "g1", "g2").collect()[0]
    assert r["n_a"] == 1 and r["t"] is None and r["df_welch"] is None
    # zero variance both sides -> se2 = 0 -> NULL by guard
    flat = spark.createDataFrame(
        [(i, ["g1", "g2"][i % 2], 7.0) for i in range(10)],
        "id long, g string, v double",
    )
    r2 = welch_t_test(flat, "v", "g", "g1", "g2").collect()[0]
    assert r2["t"] is None and r2["df_welch"] is None
    # absent group entirely: row still emits with zero count
    r3 = welch_t_test(tiny.filter("g = 'g2'"), "v", "g", "g1", "g2").collect()[0]
    assert r3["n_a"] == 0 and r3["t"] is None
