

def test_interval_overlap_matches_bruteforce(spark):
    """Grid-cell candidate gate is lossless: overlap pairs must equal
    the brute range self-join, across cell-boundary-straddling,
    touching (half-open: NOT overlapping), nested, and cross-key
    cases."""
    from product_etl_spark.operators.timeseries import (
        interval_overlap_pairs,
    )

    rows = [
        # key, id, start, end
        ("u1", 1, 0, 1000),
        ("u1", 2, 500, 1500),     # overlaps 1 across the 900 boundary
        ("u1", 3, 1000, 2000),    # touches 1 (half-open: no overlap)
        ("u1", 4, 100, 200),      # nested inside 1
        ("u1", 5, 5000, 5100),    # far away
        ("u2", 6, 0, 1000),       # same span, other key
    ]
    df = spark.createDataFrame(rows, "k string, id int, s long, e long")
    got = {
        (r["k"], r["id_a"], r["id_b"]): (r["ov_start"], r["ov_end"])
        for r in interval_overlap_pairs(df, "k", "id", "s", "e", 900).collect()
    }
    iv = {(k, i): (s, e) for k, i, s, e in rows}
    brute = {
        (k1, a, b): (max(s1, s2), min(e1, e2))
        for (k1, a), (s1, e1) in iv.items()
        for (k2, b), (s2, e2) in iv.items()
        if k1 == k2 and a < b and s1 < e2 and s2 < e1
    }
    assert got == brute
    assert ("u1", 1, 2) in got and ("u1", 1, 4) in got
    assert ("u1", 1, 3) not in got  # half-open touch
    assert not any(k == "u2" or b == 6 for k, _, b in got)


def test_interval_overlap_degenerate_span_fails_loudly(spark):
    """A years-long interval against a minutes cell must fail the job
    with the guard message, not OOM an executor with millions of
    exploded grid rows."""
    import pytest

    from product_etl_spark.operators.timeseries import (
        interval_overlap_pairs,
    )

    rows = [("u1", 1, 0, 10**9), ("u1", 2, 5, 10)]
    df = spark.createDataFrame(rows, "k string, id int, s long, e long")
    with pytest.raises(Exception, match="grid cells"):
        interval_overlap_pairs(df, "k", "id", "s", "e", 900).collect()
    # a deliberate bound raise admits it
    got = interval_overlap_pairs(
        df, "k", "id", "s", "e", 900, max_cells_per_interval=2_000_000
    )
    assert got.count() == 1


def test_interval_overlap_empty_and_reversed_intervals_dropped(spark):
    """A half-open [s, e) with e <= s contains no points, so it must
    pair with NOTHING — but the bare verification predicate
    (s_a < e_b AND s_b < e_a) emits a spurious (ov_start >= ov_end)
    pair when a normal interval spans a reversed one, and sequence()
    auto-descends on the reversed span (so the grid gate does not
    save us either). The operator drops such rows before the explode."""
    from product_etl_spark.operators.timeseries import (
        interval_overlap_pairs,
    )

    rows = [
        ("u1", 1, 2, 8),   # normal, spans the reversed one below
        ("u1", 2, 5, 3),   # REVERSED: s_b=5 < e_a=8 and s_a=2 < e_b=3
        ("u1", 3, 4, 4),   # EMPTY point interval inside id 1
        ("u1", 4, 6, 7),   # normal, overlaps id 1 only
    ]
    df = spark.createDataFrame(rows, "k string, id int, s long, e long")
    got = {
        (r["id_a"], r["id_b"]): (r["ov_start"], r["ov_end"])
        for r in interval_overlap_pairs(df, "k", "id", "s", "e", 900).collect()
    }
    assert got == {(1, 4): (6, 7)}
    assert all(s < e for s, e in got.values())


def test_seasonal_decompose_identity_and_planted_pattern(spark):
    """Constant series decomposes to trend=c, seasonal=0, residual=0;
    a pure weekly pattern has ~zero residual in the interior; and
    n = trend + seasonal + residual holds by construction."""
    import datetime as dt

    import pytest

    from product_etl_spark.operators.timeseries import seasonal_decompose

    base = dt.datetime(2024, 1, 1)  # a Monday

    def mk(counts):
        rows = []
        for d, n in enumerate(counts):
            for k in range(n):
                rows.append((d * 10000 + k, base + dt.timedelta(days=d, hours=k % 24)))
        return spark.createDataFrame(rows, "event_id long, ts timestamp")

    const = mk([5] * 28)
    out = seasonal_decompose(const, "ts", half_window=3).collect()
    assert len(out) == 28
    for r in out:
        assert r["n_events"] == 5
        assert abs(r["trend"] - 5.0) < 1e-9
        assert abs(r["seasonal"]) < 1e-9 and abs(r["residual"]) < 1e-9

    weekly = [3, 5, 7, 9, 7, 5, 3] * 4  # pure weekday shape, 4 weeks
    out = seasonal_decompose(mk(weekly), "ts", half_window=3).collect()
    # identity holds everywhere (rounding-only error)
    for r in out:
        assert abs(
            r["n_events"] - (r["trend"] + r["seasonal"] + r["residual"])
        ) < 3e-6
    # interior days: 7-day MA = weekly mean (constant), so the weekly
    # shape lands in `seasonal` and residual ~ 0
    for r in out[3:-3]:
        assert abs(r["trend"] - 39 / 7.0) < 1e-6
        assert abs(r["residual"]) < 0.6  # edge-window seasonal bleed only

    with pytest.raises(ValueError, match="half_window >= 1"):
        seasonal_decompose(const, "ts", half_window=0)
