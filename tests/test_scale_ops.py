"""Scale machinery tests: salted joins/aggs preserve semantics,
bucketed joins eliminate exchanges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from product_etl_spark.operators.bucketing import bucketed_join, write_bucketed
from product_etl_spark.operators.skew import salted_join, two_phase_agg


def test_salted_join_semantics(spark):
    # one hot key (k=hot appears 500x), small side not broadcast-worthy
    big = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", i) for i in range(10)],
        "k string, v int",
    )
    small = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("unused", "U")], "k string, label string"
    )
    out = salted_join(big, small, "k", n_salts=4)
    assert out.count() == 510
    labels = dict(
        out.groupBy("label").count().rdd.map(lambda r: (r["label"], r["count"])).collect()
    )
    assert labels == {"H": 500, "C": 10}


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([("a", 1), ("orphan", 2)], "k string, v int")
    small = spark.createDataFrame([("a", "A")], "k string, label string")
    out = salted_join(big, small, "k", n_salts=4, how="left").collect()
    by_k = {r["k"]: r["label"] for r in out}
    assert by_k == {"a": "A", "orphan": None}


def test_two_phase_agg_matches_direct(spark):
    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(100)] + [("cold", 1.0)],
        "k string, total double",
    ).withColumn("n", F.lit(1).cast("long")).withColumn(
        "total", F.col("total").cast("decimal(18,2)")
    )
    out = {
        r["k"]: (r["n"], str(r["total"]))
        for r in two_phase_agg(
            df, ["k"], {"n": (F.sum, F.sum), "total": (F.sum, F.sum)}, n_salts=4
        ).collect()
    }
    assert out["hot"] == (100, "4950.00")
    assert out["cold"] == (1, "1.00")


@pytest.mark.usefixtures("spark")
def test_bucketed_join_no_exchange(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
    orders = spark.createDataFrame(
        [(i, f"c{i % 7}") for i in range(1000)], "o_orderkey long, cust string"
    )
    lineitem = spark.createDataFrame(
        [(i % 1000, i) for i in range(5000)], "o_orderkey long, line int"
    )
    write_bucketed(orders, "t_orders_b", "o_orderkey", n_buckets=8)
    write_bucketed(lineitem, "t_lineitem_b", "o_orderkey", n_buckets=8)
    joined = bucketed_join(spark, "t_orders_b", "t_lineitem_b", "o_orderkey")
    assert joined.count() == 5000
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
    # aggregation on the bucket key is exchange-free too
    agg = spark.table("t_lineitem_b").groupBy("o_orderkey").count()
    agg.collect()
    agg_plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in agg_plan


def test_groupwise_zscore_and_scale(spark):
    from product_etl_spark.operators.grouped import (
        groupwise_minmax_scale,
        groupwise_zscore,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0), ("b", 10.0)],
        "g string, v double",
    )
    z = {(r["g"], r["v"]): r["zscore"] for r in groupwise_zscore(df, ["g"], "v").collect()}
    assert abs(z[("a", 2.0)]) < 1e-9  # group mean -> 0
    assert z[("a", 3.0)] > 0 and z[("a", 1.0)] < 0
    assert z[("b", 10.0)] == 0.0  # constant group

    s = {(r["g"], r["v"]): r["scaled"] for r in groupwise_minmax_scale(df, ["g"], "v").collect()}
    assert s[("a", 1.0)] == 0.0 and s[("a", 3.0)] == 1.0 and s[("a", 2.0)] == 0.5
    assert s[("b", 10.0)] == 0.5


def test_bucketed_cumsum_matches_global_window(spark):
    """Two-phase prefix sum == naive whole-frame window, including
    across bucket boundaries and for the first row of each bucket."""
    from pyspark.sql import Window
    import pyspark.sql.functions as F
    from product_etl_spark.operators.packing import bucketed_cumsum, pack_contexts

    rows = [(i * 3, (i * 7) % 11 + 1) for i in range(50)]  # sparse ids
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r["id"]: r["cum_before"]
        for r in bucketed_cumsum(df, "id", "v", bucket_width=16).collect()
    }
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["id"]: r["c"]
        for r in df.withColumn(
            "c", F.coalesce(F.sum("v").over(w), F.lit(0))
        ).collect()
    }
    assert got == want
    inc = {
        r["id"]: r["cum_before"]
        for r in bucketed_cumsum(
            df, "id", "v", bucket_width=16, inclusive=True
        ).collect()
    }
    assert all(inc[i] == want[i] + dict(rows)[i] for i, _ in rows)
    # pack ids are monotone non-decreasing in id order
    packs = (
        pack_contexts(df, "id", "v", pack_size=10, bucket_width=16)
        .orderBy("id")
        .select("pack_id")
        .collect()
    )
    seq = [r["pack_id"] for r in packs]
    assert seq == sorted(seq) and seq[0] == 0


def test_approx_quantile_buckets_tracks_exact_ntile(spark, sf_dir):
    """The map-only NTILE swap: bucket sizes within 2% of perfectly
    equal, bucket ranges ordered, and the plan has NO window/sort —
    q76's documented 100 TB form, proven not just promised."""
    import pyspark.sql.functions as F
    from product_etl_spark.operators.quantiles import approx_quantile_buckets

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = o.count()
    b = approx_quantile_buckets(o, "o_totalprice", n_buckets=4)
    rows = (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("bucket")
        .collect()
    )
    assert [r["bucket"] for r in rows] == [1, 2, 3, 4]
    for r in rows:
        assert abs(r["cnt"] - n / 4) <= max(2, 0.02 * n)
    for a, c in zip(rows, rows[1:]):  # ranges strictly ordered
        assert a["hi"] <= c["lo"]
    # map-only: no WindowExec, no global Sort in the bucketing plan
    b.collect()
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Sort" not in plan


def test_salted_self_pairs_exact_and_distributed(spark):
    from product_etl_spark.operators.skew import salted_self_pairs

    # one giant block (the hot key) + one small block
    rows = [(i, "hot" if i < 40 else "cold", float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, blk string, val double")

    got = salted_self_pairs(df, "blk", "id", n_salts=4)
    pairs = {(r["blk"], r["id_a"], r["id_b"]) for r in got.collect()}

    a = df.selectExpr("blk", "id as id_a")
    b = df.selectExpr("blk as blk2", "id as id_b")
    naive = {
        (r["blk"], r["id_a"], r["id_b"])
        for r in a.join(b, (a.blk == b.blk2) & (a.id_a < b.id_b)).collect()
    }
    assert pairs == naive  # exactly once each: 40*39/2 + 10*9/2
    assert len(pairs) == 780 + 45

    # payload columns survive with _a/_b suffixes
    row = got.filter("id_a = 0").limit(1).collect()[0]
    assert row["val_a"] == 0.0 and row["val_b"] > 0.0

    # the shuffle key is the (block, lo, hi) tuple, not block alone —
    # that's the whole point: a hot block spreads over n(n+1)/2 buckets
    got.collect()
    plan = got._jdf.queryExecution().executedPlan().toString()
    if "hashpartitioning" in plan:  # absent if AQE broadcast the tiny side
        assert "_lo" in plan.split("hashpartitioning", 1)[1][:200]


def test_runtime_bloom_filter_join_reduction(spark, sf_dir):
    """Spark's runtime bloom-filter join reduction is a config lever,
    not code: with a selective dimension filter, the optimizer injects
    a bloom_filter_agg over the build side and pre-filters the probe
    side scan. The application-side threshold (default 10 GB) gates it
    to genuinely large probe scans — we drop the threshold here only
    to prove the engine path is live on this build."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1b",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan  # probe-side application
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_q157_plan_actually_salts(spark, sf_dir):
    """q157's oracle only proves result equality — a 'simplified'
    plain join would still pass it. Guard the REWRITE: the executed
    plan must explode the dim side across salts and join on the
    two-column (key, salt) condition."""
    from product_etl_spark.plans import CATALOG

    df = CATALOG["q157_salted_join_rollup"]["fn"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" in plan or "Explode" in plan or "Generate" in plan
    assert "_salt" in plan  # join keys include the salt column


def test_user_burstiness_exact_moments(spark):
    """CV from integer moment sums: a metronomic user scores 0, an
    irregular one matches the hand-computed population CV; users under
    min_events drop."""
    import math

    from product_etl_spark.operators.timeseries import user_burstiness

    def ts(s):
        return f"2024-01-01 00:00:{s:02d}"

    rows = (
        # user 1: gaps 10, 10, 10 -> CV 0
        [(i, ts(i * 10), 1, "x", None, None) for i in range(4)]
        # user 2: gaps 5, 15 -> mean 10, var ((5-10)^2+(15-10)^2)/2 = 25
        + [(10, ts(0), 2, "x", None, None), (11, ts(5), 2, "x", None, None),
           (12, ts(20), 2, "x", None, None)]
        # user 3: one event -> dropped
        + [(20, ts(1), 3, "x", None, None)]
    )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["user_id"]: (r["n_events"], r["mean_gap_s"], r["cv_gap"])
        for r in user_burstiness(df, min_events=3).collect()
    }
    assert set(got) == {1, 2}
    assert got[1] == (4, 10.0, 0.0)
    assert got[2][0] == 3 and got[2][1] == 10.0
    assert abs(got[2][2] - round(math.sqrt(25.0) / 10.0, 6)) < 1e-9


def test_next_event_training_pairs_contexts(spark):
    from product_etl_spark.operators.packing import (
        next_event_training_pairs,
    )

    rows = [
        (1, "2024-01-01 00:00:01", 7, "a", None, None),
        (2, "2024-01-01 00:00:02", 7, "b", None, None),
        (3, "2024-01-01 00:00:03", 7, "c", None, None),
        (4, "2024-01-01 00:00:04", 7, "d", None, None),
        (5, "2024-01-01 00:00:05", 7, "e", None, None),
        (9, "2024-01-01 00:00:09", 8, "z", None, None),  # first event: no pair
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["event_id"]: (r["ctx"], r["label"], r["n_ctx"])
        for r in next_event_training_pairs(df, context=3).collect()
    }
    assert 9 not in got and 1 not in got  # first events drop
    assert got[2] == ("a", "b", 1)
    assert got[3] == ("a b", "c", 2)
    assert got[4] == ("a b c", "d", 3)
    assert got[5] == ("b c d", "e", 3)  # window slides, oldest first


def test_temperature_mixture_budgets_flattens_head(spark):
    """T=2 mixing: a 100:1 domain imbalance becomes a 10:1 budget
    imbalance (sqrt), never over-allocating the total; T=1 stays
    proportional (pow path)."""
    from product_etl_spark.operators.packing import (
        temperature_mixture_budgets,
    )

    rows = [("big", i) for i in range(400)] + [("small", i) for i in range(4)]
    df = spark.createDataFrame(rows, "source string, i long")
    out = {
        r["domain"]: r
        for r in temperature_mixture_budgets(
            df, "source", 1000, temperature=2
        ).collect()
    }
    assert out["big"]["n_docs"] == 400 and out["small"]["n_docs"] == 4
    # sqrt(400)/sqrt(4) = 10:1, vs the raw 100:1
    assert out["big"]["weight"] == 20.0 and out["small"]["weight"] == 2.0
    assert abs(out["big"]["share"] / out["small"]["share"] - 10.0) < 0.02
    total = sum(r["sample_budget"] for r in out.values())
    assert total <= 1000  # floor never over-allocates

    prop = {
        r["domain"]: r["share"]
        for r in temperature_mixture_budgets(
            df, "source", 1000, temperature=1
        ).collect()
    }
    assert abs(prop["big"] / prop["small"] - 100.0) < 0.5


def test_key_skew_profile_planted_hot_key(spark):
    """A planted 90/5/5 key split: the hot key tops the report with
    the right share, x_mean and salt factor; ties rank by key."""
    from product_etl_spark.operators.skew import key_skew_profile

    rows = (
        [("hot", i) for i in range(90)]
        + [("a", i) for i in range(5)]
        + [("b", i) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "k string, i long")
    out = [
        (r["k"], r["n_rows"], r["share"], r["x_mean"], r["salt_factor"])
        for r in key_skew_profile(
            df, ["k"], top_n=3, target_rows_per_task=30
        ).collect()
    ]
    assert out[0] == ("hot", 90, 0.9, 2.7, 3)
    assert out[1] == ("a", 5, 0.05, 0.15, 1)  # tie with 'b' -> key asc
    assert out[2] == ("b", 5, 0.05, 0.15, 1)


def test_rfm_segments_planted(spark):
    """Five customers strictly ordered on all three dimensions land
    in five distinct quintiles: customer 5 (most recent, most
    orders, highest spend) scores (5,5,5); customer 1 scores
    (1,1,1); totals are the exact decimal sums."""
    from datetime import datetime

    from product_etl_spark.operators.segmentation import rfm_segments

    rows = []
    for c in range(1, 6):
        for j in range(c):  # customer c places c orders
            rows.append(
                (c, datetime(2024, 1, c, 12, 0, j), 100.0 * c)
            )
    orders = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate timestamp, o_totalprice double"
    )
    out = {
        (r["r_score"], r["f_score"], r["m_score"]): r
        for r in rfm_segments(orders).collect()
    }
    assert (5, 5, 5) in out and (1, 1, 1) in out
    assert len(out) == 5  # strictly ordered -> diagonal segments
    assert out[(5, 5, 5)]["n_customers"] == 1
    assert out[(5, 5, 5)]["total_monetary"] == 2500.0  # 5 * 500
    assert out[(1, 1, 1)]["total_monetary"] == 100.0


def test_cusum_changepoint_planted_shift(spark):
    """Rate 1/day for days 1-5 then 11/day for days 6-10: the scaled
    CUSUM S_t = sum(10*n_i - 60) walks to -250 by day 5 and back to
    0 — the |S| peak lands exactly on the last pre-shift day, every
    statistic an exact integer."""
    from datetime import datetime

    from product_etl_spark.operators.timeseries import cusum_changepoint

    rows = []
    for d in range(1, 6):
        rows.append((datetime(2024, 1, d, 12),))
    for d in range(6, 11):
        rows.extend([(datetime(2024, 1, d, h),) for h in range(11)])
    ev = spark.createDataFrame(rows, "ts timestamp")
    out = {str(r["day"]): r for r in cusum_changepoint(ev, "ts").collect()}
    assert len(out) == 10
    assert out["2024-01-05"]["cusum"] == -250
    assert out["2024-01-05"]["is_peak"] == 1
    assert out["2024-01-10"]["cusum"] == 0  # telescopes to zero
    assert sum(r["is_peak"] for r in out.values()) == 1


def test_kaplan_meier_hand_check(spark):
    """Planted cohort (end = day 10, censor window 1 day): events at
    t=2 (2 of 5 at risk) and t=4 (1 of 2) give S = 1, 0.6, 0.3;
    same-t censored users count in the risk set but not the deaths."""
    from datetime import datetime

    from product_etl_spark.operators.timeseries import kaplan_meier

    spans = {
        1: (1, 3), 2: (1, 3), 3: (1, 5),   # churned (gap >= 1)
        4: (8, 10), 5: (6, 10), 6: (10, 10),  # censored (last day)
    }
    rows = []
    for u, (a, b) in spans.items():
        rows.append((u, datetime(2024, 1, a)))
        rows.append((u, datetime(2024, 1, b)))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        r["t"]: r
        for r in kaplan_meier(ev, "user_id", "ts", censor_last_days=1)
        .collect()
    }
    assert out[0]["n_at_risk"] == 6 and out[0]["survival"] == 1.0
    assert out[2]["n_at_risk"] == 5 and out[2]["n_events"] == 2
    assert out[2]["n_censored"] == 1
    assert abs(out[2]["survival"] - 0.6) < 1e-6
    assert out[4]["n_at_risk"] == 2 and out[4]["n_events"] == 1
    assert abs(out[4]["survival"] - 0.3) < 1e-6


def test_kaplan_meier_extinction_row(spark):
    """When every user still at risk churns at the max lifetime
    (d = n), survival is exactly 0 — the integer-decided flag, not a
    ln(0)."""
    from datetime import datetime

    from product_etl_spark.operators.timeseries import kaplan_meier

    rows = []
    for u, (a, b) in {1: (1, 8), 2: (1, 8), 3: (9, 10)}.items():
        rows.append((u, datetime(2024, 1, a)))
        rows.append((u, datetime(2024, 1, b)))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        r["t"]: r
        for r in kaplan_meier(ev, "user_id", "ts", censor_last_days=1)
        .collect()
    }
    assert out[7]["n_events"] == 2 and out[7]["n_at_risk"] == 2
    assert out[7]["survival"] == 0.0
    assert out[1]["survival"] == 1.0  # the censored user's row


def test_cusum_changepoint_densifies_outage_days(spark):
    """A calendar day with ZERO events must still walk the CUSUM
    (2 events day 1, outage day 2, 2 events day 3 -> S = 2, -2, 0,
    with the zero-event day present in the curve)."""
    from datetime import datetime

    from product_etl_spark.operators.timeseries import cusum_changepoint

    ev = spark.createDataFrame(
        [
            (datetime(2024, 1, 1, 1),),
            (datetime(2024, 1, 1, 2),),
            (datetime(2024, 1, 3, 1),),
            (datetime(2024, 1, 3, 2),),
        ],
        "ts timestamp",
    )
    out = {str(r["day"]): r for r in cusum_changepoint(ev, "ts").collect()}
    assert len(out) == 3  # densified: the outage day exists
    assert out["2024-01-02"]["n_events"] == 0
    assert out["2024-01-02"]["cusum"] == -2
    assert out["2024-01-01"]["cusum"] == 2
    assert out["2024-01-03"]["cusum"] == 0


def test_mad_anomaly_days_planted(spark):
    """[10,10,10,10,100]: median 10, MAD 0 -> only the 100-day flags
    (2*dev > 3*0); an all-identical series flags nothing (strict
    inequality)."""
    from datetime import datetime

    from product_etl_spark.operators.timeseries import mad_anomaly_days

    rows = []
    for d in range(1, 5):
        rows.extend([(datetime(2024, 1, d, h),) for h in range(10)])
    rows.extend(
        [(datetime(2024, 1, 5, h, m),) for h in range(10) for m in range(10)]
    )
    ev = spark.createDataFrame(rows, "ts timestamp")
    out = {str(r["day"]): r for r in mad_anomaly_days(ev, "ts").collect()}
    assert [d for d, r in out.items() if r["is_anomaly"]] == ["2024-01-05"]
    assert out["2024-01-05"]["dev2"] == 180  # |2*100 - 20|

    flat = spark.createDataFrame(
        [(datetime(2024, 1, d),) for d in range(1, 6)], "ts timestamp"
    )
    assert all(
        r["is_anomaly"] == 0 for r in mad_anomaly_days(flat, "ts").collect()
    )


def test_mad_anomaly_days_even_count_median(spark):
    """Even-length series: med2 = lower+upper middle (counts 1,2,3,4
    -> med2 = 5), exercised without any float median."""
    from datetime import datetime

    from product_etl_spark.operators.timeseries import mad_anomaly_days

    rows = []
    for d, n in enumerate([1, 2, 3, 4], start=1):
        rows.extend([(datetime(2024, 1, d, h),) for h in range(n)])
    ev = spark.createDataFrame(rows, "ts timestamp")
    out = {str(r["day"]): r for r in mad_anomaly_days(ev, "ts").collect()}
    # dev2 = |2n - 5| = [3, 1, 1, 3]
    assert [out[f"2024-01-0{d}"]["dev2"] for d in range(1, 5)] == [3, 1, 1, 3]
    # med2dev = 1+3 = 4; flag iff 2*dev2 > 12 -> none
    assert all(r["is_anomaly"] == 0 for r in out.values())


def test_weekday_uniformity_hand_check(spark):
    """One event per ISO weekday -> chi2 0; all seven on Monday ->
    chi2 = (42^2 + 6*49)/49 = 42.0 exactly."""
    from datetime import datetime

    from product_etl_spark.operators.timeseries import weekday_uniformity

    # 2024-01-01 is a Monday
    flat = spark.createDataFrame(
        [(datetime(2024, 1, d),) for d in range(1, 8)], "ts timestamp"
    )
    rows = weekday_uniformity(flat, "ts").collect()
    assert [r["weekday"] for r in rows] == list(range(7))
    assert all(r["chi2"] == 0.0 and r["dev_sq"] == 0 for r in rows)

    skew = spark.createDataFrame(
        [(datetime(2024, 1, 1, h),) for h in range(7)], "ts timestamp"
    )
    rows = {r["weekday"]: r for r in weekday_uniformity(skew, "ts").collect()}
    assert rows[0]["n_events"] == 7 and rows[0]["dev_sq"] == 1764
    assert rows[1]["n_events"] == 0 and rows[1]["dev_sq"] == 49
    assert rows[0]["chi2"] == 42.0


def test_seasonal_naive_backtest_hand_check(spark):
    """14-day series with a perfect weekly pattern scores zero error;
    breaking one day by +3 gives total_abs_err 3 over 7 scored days
    (the densified calendar supplies the zero-event days)."""
    from datetime import datetime

    from product_etl_spark.operators.timeseries import (
        seasonal_naive_backtest,
    )

    pattern = [1, 2, 0, 1, 2, 0, 1]  # includes zero-event days
    rows = []
    for week in range(2):
        for i, n in enumerate(pattern):
            d = week * 7 + i + 1
            rows.extend([(datetime(2024, 1, d, h),) for h in range(n)])
    ev = spark.createDataFrame(rows, "ts timestamp")
    r = seasonal_naive_backtest(ev, "ts", period=7).collect()[0]
    assert r["n_days"] == 7
    assert r["total_abs_err"] == 0 and r["mae"] == 0.0
    assert r["rmse"] == 0.0

    rows.extend([(datetime(2024, 1, 14, 20 + h),) for h in range(3)])
    ev2 = spark.createDataFrame(rows, "ts timestamp")
    r2 = seasonal_naive_backtest(ev2, "ts", period=7).collect()[0]
    assert r2["total_abs_err"] == 3 and r2["total_err"] == 3
    assert abs(r2["mae"] - 3 / 7) < 1e-6


def test_balanced_shards_no_single_task_window(spark):
    """q220's rank must come from the two-level global_sort_ranks,
    never a single-task row_number() OVER (ORDER BY) — the executed
    plan may contain Window nodes only partitioned by _pid (the
    range-partition id), and the snake arithmetic is pure projection."""
    from product_etl_spark.operators.sampling import balanced_shards

    df = spark.range(5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("w")
    )
    out = balanced_shards(df, "w", "doc_id", 8)
    out.write.format("noop").mode("overwrite").save()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # global_sort_ranks checkpoints its ranked frame, so the final
    # plan must show NO Window at all (the per-_pid windows already
    # ran behind the checkpoint) and no global Sort
    final = plan.split("== Initial Plan ==")[0]
    assert "Window" not in final
    # every doc lands in exactly one shard, all 8 shards populated
    agg = {r["shard"]: r["c"] for r in
           out.groupBy("shard").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert sorted(agg) == list(range(8)) and sum(agg.values()) == 5000


@pytest.mark.slow
def test_balanced_shards_spread_bound_property(spark):
    """Snake-deal balance property on adversarial weight shapes: the
    max-min shard-total spread stays within 2x the largest single
    weight (per-pass folded-pair spreads telescope over the sorted
    sequence; the final partial pass adds at most one item)."""
    shapes = [
        [1000] + [1] * 30,                      # one giant
        [2 ** (i % 11) for i in range(64)],     # heavy tail
        [7] * 40,                               # all equal
        list(range(1, 50)),                     # linear ramp
        [5, 5, 5, 1000, 1000, 1000, 1, 1, 1],   # clustered
    ]
    from product_etl_spark.operators.sampling import balanced_shards

    for shape in shapes:
        df = spark.createDataFrame(
            [(i, w) for i, w in enumerate(shape)], "doc_id long, w long"
        )
        for n in (2, 3, 5):
            totals = [
                r["t"]
                for r in balanced_shards(df, "w", "doc_id", n)
                .groupBy("shard")
                .agg(F.sum("w").alias("t"))
                .collect()
            ]
            assert max(totals) - min(totals) <= 2 * max(shape), (
                shape[:5],
                n,
                totals,
            )
