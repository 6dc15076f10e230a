"""Property-based tests (hypothesis) for the round-11 second-wave
operators, each against a pure-Python model or an invariant the
algorithm must hold: Kaplan-Meier monotonicity + uncensored
empirical-survival equality, recall-audit bounds and exact-duplicate
guarantees, CUSUM telescoping to zero, MAD flag robustness, weekday
chi-square nonnegativity + zero-iff-uniform, and KN probability
bounds.

Strategy note (the r7 convention): hypothesis drives SMALL Python
datasets; each property evaluates through Spark in one
createDataFrame+collect, and example counts stay low (Spark
round-trips are ~100 ms each)."""

from __future__ import annotations

from datetime import datetime

from hypothesis import given, settings
from hypothesis import strategies as st
import pytest


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 6), st.integers(1, 9)),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
def test_kaplan_meier_monotone_and_uncensored_empirical(spark, spans):
    """Survival is non-increasing in t; with NOBODY censored
    (censor_last_days=0) S at the largest t equals the extinction 0
    and at each step matches the empirical product — cross-checked
    against a pure-Python KM."""
    from product_etl_spark.operators.timeseries import kaplan_meier

    rows = []
    for u, (start, life) in enumerate(spans):
        rows.append((u, datetime(2024, 1, start)))
        rows.append((u, datetime(2024, 1, start + life)))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = kaplan_meier(ev, "user_id", "ts", censor_last_days=0).collect()
    out = sorted(out, key=lambda r: r["t"])
    # python model: all users churn at their lifetime
    lifetimes = sorted(life for _, life in spans)
    surv, n = 1.0, len(lifetimes)
    model = {}
    from collections import Counter

    cnt = Counter(lifetimes)
    at_risk = n
    for t in sorted(cnt):
        surv *= 1 - cnt[t] / at_risk
        model[t] = surv
        at_risk -= cnt[t]
    prev = 1.0
    for r in out:
        assert r["survival"] <= prev + 1e-9
        prev = r["survival"]
        assert abs(r["survival"] - model[r["t"]]) < 1e-5
    assert out[-1]["survival"] == 0.0  # everyone churns eventually


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("pqrs"), min_size=4, max_size=8),
        min_size=2,
        max_size=6,
    )
)
@pytest.mark.slow
def test_ann_recall_audit_bounds_and_duplicate_guarantee(spark, vecs):
    """recall and hits/candidates are always within bounds, and a
    vector IDENTICAL to the query (same signs by construction) is
    always a candidate."""
    from product_etl_spark.operators.similarity import ann_recall_audit

    base = {"p": 1.0, "q": -1.0, "r": 2.0, "s": -2.0}
    rows = [(0, [base[c] for c in vecs[0]][:4])]
    rows.append((1, [2.0 * v for v in rows[0][1]]))  # sign-identical
    for i, v in enumerate(vecs[1:], start=2):
        rows.append((i, [base[c] for c in v][:4]))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    out = ann_recall_audit(
        df, "embedding", "vec_id",
        n_queries=1, k=2, n_bands=1, band_bits=4,
    ).collect()[0]
    assert 0.0 <= out["recall"] <= 1.0
    assert out["hits"] <= out["n_candidates"]
    assert out["n_candidates"] >= 1  # the scaled twin always matches


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(0, 5), min_size=1, max_size=10)
)
def test_cusum_telescopes_to_zero(spark, daily_counts):
    """The final CUSUM value is EXACTLY zero for any series (the sum
    of D*n_i - N over all days telescopes), and the curve is dense
    over the calendar span."""
    from product_etl_spark.operators.timeseries import cusum_changepoint

    rows = []
    for d, n in enumerate(daily_counts, start=1):
        rows.extend([(datetime(2024, 1, d, h),) for h in range(n)])
    if not rows:
        return
    ev = spark.createDataFrame(rows, "ts timestamp")
    out = sorted(cusum_changepoint(ev, "ts").collect(), key=lambda r: r["day"])
    assert out[-1]["cusum"] == 0
    # dense: one row per calendar day between first and last event day
    observed_days = sorted({r[0].day for r in rows})
    assert len(out) == observed_days[-1] - observed_days[0] + 1
    assert sum(r["is_peak"] for r in out) == 1


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(1, 30), min_size=2, max_size=9))
@pytest.mark.slow
def test_mad_flags_are_scale_free(spark, counts):
    """Multiplying every daily count by 2 cannot change which days
    flag (median and MAD scale together; the compare is
    homogeneous)."""
    from product_etl_spark.operators.timeseries import mad_anomaly_days

    def run(scale):
        rows = []
        for d, n in enumerate(counts, start=1):
            rows.extend(
                [(datetime(2024, 1, d, h // 60, h % 60),)
                 for h in range(n * scale)]
            )
        ev = spark.createDataFrame(rows, "ts timestamp")
        return {
            str(r["day"]): r["is_anomaly"]
            for r in mad_anomaly_days(ev, "ts").collect()
        }

    assert run(1) == run(2)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(0, 6), min_size=7, max_size=7))
def test_weekday_chi2_nonneg_zero_iff_uniform(spark, per_day):
    """chi2 >= 0 always, and 0 exactly when all seven weekday counts
    are equal (2024-01-01 anchors Monday)."""
    from product_etl_spark.operators.timeseries import weekday_uniformity

    rows = []
    for d, n in enumerate(per_day, start=1):
        rows.extend([(datetime(2024, 1, d, h),) for h in range(n)])
    if not rows:
        return
    ev = spark.createDataFrame(rows, "ts timestamp")
    out = weekday_uniformity(ev, "ts").collect()
    chi2 = out[0]["chi2"]
    assert chi2 >= 0.0
    uniform = len(set(per_day)) == 1
    assert (chi2 == 0.0) == uniform


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcd"), min_size=2, max_size=6),
        min_size=1,
        max_size=5,
    )
)
def test_kneser_ney_probabilities_in_unit_interval(spark, docs_words):
    """Every surfaced P_kn lies in (0, 1]: the discount can never
    push an observed bigram's probability to 0 or above 1."""
    from product_etl_spark.operators.collocations import kneser_ney_bigrams

    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs_words)],
        "doc_id long, text string",
    )
    for r in kneser_ney_bigrams(docs, top_n=100).collect():
        assert 0.0 < r["pkn"] <= 1.0, r
