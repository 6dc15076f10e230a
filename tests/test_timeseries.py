"""Unit tests for operators/timeseries.py and the weighted sampler —
small controlled frames where the expected output is hand-checkable
(catalog-level parity for q96–q103 lives in test_oracle_parity.py).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from product_etl_spark.operators import sampling as SA
from product_etl_spark.operators import timeseries as TS


def _d(s):
    return dt.date.fromisoformat(s)


def test_gapfill_locf_fills_and_carries(spark):
    df = spark.createDataFrame(
        [
            (1, _d("2024-01-01"), 10.0),
            (1, _d("2024-01-04"), 40.0),
            (2, _d("2024-02-01"), 5.0),
        ],
        "k int, day date, v double",
    )
    out = TS.gapfill_locf(df, "k", "day", "v").orderBy("k", "day").collect()
    k1 = [(r.day.isoformat(), r.v_filled, r.is_gap) for r in out if r.k == 1]
    assert k1 == [
        ("2024-01-01", 10.0, 0),
        ("2024-01-02", 10.0, 1),
        ("2024-01-03", 10.0, 1),
        ("2024-01-04", 40.0, 0),
    ]
    # single-observation key: no gap rows synthesized
    assert [(r.v_filled, r.is_gap) for r in out if r.k == 2] == [(5.0, 0)]


def test_trailing_range_agg_window_bounds(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 1.0),
        (1, base + dt.timedelta(seconds=5), 2.0),
        (1, base + dt.timedelta(seconds=100), 4.0),
        (2, base, 8.0),
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, v double")
    out = TS.trailing_range_agg(df, "k", "ts", "v", trailing_us=10 * 1_000_000)
    got = {
        (r.k, r.v): (r.trail_sum, r.trail_n)
        for r in out.collect()
    }
    assert got[(1, 1.0)] == (1.0, 1)
    assert got[(1, 2.0)] == (3.0, 2)  # 5s apart: inside the 10s frame
    assert got[(1, 4.0)] == (4.0, 1)  # 95s gap: frame excludes earlier rows
    assert got[(2, 8.0)] == (8.0, 1)  # other key untouched


def test_transition_counts(spark):
    df = spark.createDataFrame(
        [
            (1, 1, "a"),
            (1, 2, "b"),
            (1, 3, "b"),
            (2, 1, "a"),
            (2, 2, "b"),
        ],
        "k int, seq int, t string",
    )
    out = {
        (r.prev_type, r.next_type): r.n
        for r in TS.transition_counts(df, "k", "t", ["seq"]).collect()
    }
    assert out == {("a", "b"): 2, ("b", "b"): 1}


def test_weighted_sample_deterministic_and_weight_monotone(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = SA.weighted_sample(docs, "doc_id", "n_chars", 1, 5)
    ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    # stable under repartitioning (membership is content-addressed)
    ids2 = sorted(
        r.doc_id
        for r in SA.weighted_sample(docs.repartition(7), "doc_id", "n_chars", 1, 5)
        .select("doc_id")
        .collect()
    )
    assert ids == ids2 and len(ids) > 0
    # expected fraction ~ 1/5 of rows (weighted, so loose bounds)
    n = docs.count()
    assert 0.08 * n < len(ids) < 0.40 * n
    # inclusion probability rises with weight: kept docs are longer on average
    mean_all = docs.agg(F.avg("n_chars")).first()[0]
    mean_kept = kept.agg(F.avg("n_chars")).first()[0]
    assert mean_kept > mean_all


def test_weighted_sample_full_fraction_keeps_everything(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert SA.weighted_sample(docs, "doc_id", "n_chars", 5, 1).count() == docs.count()
