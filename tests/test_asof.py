"""asof_join vs pandas.merge_asof — the library owns the semantics,
so every (direction, tolerance, strict) combination is checked
against the reference implementation on deterministic data."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from product_etl_spark.operators.timeseries import asof_join


def _h(s: str, m: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % m


@pytest.fixture(scope="module")
def frames(spark):
    left_rows = [
        (u, i, 1000 + _h(f"L{u},{i}", 500))
        for u in range(4)
        for i in range(20)
    ]
    right_rows = [
        (u, j, 1000 + _h(f"R{u},{j}", 500), 10 * u + j)
        for u in range(4)
        for j in range(8)
    ]
    left = spark.createDataFrame(left_rows, "uid int, row_id int, t long")
    right = spark.createDataFrame(
        right_rows, "uid int, ref_id int, t long, payload int"
    )
    return left, right, left_rows, right_rows


def _expected(left_rows, right_rows, direction, tolerance=None,
              allow_exact=True):
    lp = pd.DataFrame(left_rows, columns=["uid", "row_id", "t"]).sort_values("t", kind="mergesort")
    rp = pd.DataFrame(
        right_rows, columns=["uid", "ref_id", "t", "payload"]
    ).sort_values("t", kind="mergesort")
    m = pd.merge_asof(
        lp,
        rp[["uid", "t", "payload"]],
        on="t",
        by="uid",
        direction=direction,
        tolerance=tolerance,
        allow_exact_matches=allow_exact,
        suffixes=("", "_r"),
    )
    return {
        (r.uid, r.row_id): (None if pd.isna(r.payload) else int(r.payload))
        for r in m.itertuples()
    }


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_matches_pandas_merge_asof(frames, direction):
    left, right, lr, rr = frames
    got = asof_join(left, right, "uid", "t", ["payload"], direction=direction)
    got_map = {
        (r["uid"], r["row_id"]): r["payload_asof"] for r in got.collect()
    }
    assert got_map == _expected(lr, rr, direction)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_tolerance_matches_pandas(frames, direction):
    left, right, lr, rr = frames
    got = asof_join(
        left, right, "uid", "t", ["payload"], direction=direction,
        tolerance=F.lit(25),
    )
    got_map = {
        (r["uid"], r["row_id"]): r["payload_asof"] for r in got.collect()
    }
    assert got_map == _expected(lr, rr, direction, tolerance=25)


def test_strict_excludes_same_instant(spark):
    left = spark.createDataFrame([(1, 0, 100)], "uid int, row_id int, t long")
    right = spark.createDataFrame(
        [(1, 9, 100, 77), (1, 8, 90, 55)], "uid int, ref_id int, t long, payload int"
    )
    inclusive = asof_join(left, right, "uid", "t", ["payload"]).collect()[0]
    assert inclusive["payload_asof"] == 77  # same-instant match allowed
    strict = asof_join(
        left, right, "uid", "t", ["payload"], strict=True
    ).collect()[0]
    assert strict["payload_asof"] == 55  # falls back to the earlier row


def test_reserved_columns_and_bad_direction_raise(spark):
    left = spark.createDataFrame([(1, 2, 3)], "uid int, t int, _side int")
    right = spark.createDataFrame([(1, 2, 3)], "uid int, t int, v int")
    with pytest.raises(ValueError, match="_side"):
        asof_join(left, right, "uid", "t", ["v"])
    ok_left = spark.createDataFrame([(1, 2)], "uid int, t int")
    with pytest.raises(ValueError, match="direction"):
        asof_join(ok_left, right, "uid", "t", ["v"], direction="nearest")


def test_single_exchange_plan(spark):
    """The as-of is ONE key-partitioned window: exactly one exchange,
    no range join, no broadcast of the fact sides."""
    left = spark.createDataFrame([(1, 0, 10)], "uid int, row_id int, t long")
    right = spark.createDataFrame(
        [(1, 1, 5, 3)], "uid int, ref_id int, t long, payload int"
    )
    df = asof_join(left, right, "uid", "t", ["payload"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1
    assert "Join" not in final


def test_hypothesis_random_matches_pandas(spark):
    """Property: on arbitrary integer event sets (duplicate
    timestamps, sparse keys, empty right groups), asof_join ==
    pandas.merge_asof for backward+inclusive. Hypothesis drives the
    data; one Spark round-trip per example is too slow, so examples
    are batched into a single frame keyed by a case id."""
    from hypothesis import given, settings, strategies as st

    rights = st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 99)),
        min_size=0, max_size=8,
    )
    lefts = st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)),
        min_size=1, max_size=8,
    )

    cases = []

    @settings(max_examples=30, deadline=None, database=None)
    @given(lefts, rights)
    def _collect(ls, rs):
        cases.append((ls, rs))

    _collect()

    left_rows, right_rows = [], []
    for cid, (ls, rs) in enumerate(cases):
        for i, (u, t) in enumerate(ls):
            left_rows.append((cid * 10 + u, i, t))
        # enforce the operator's determinism contract: one right row
        # per (key, ts) — with duplicates, which one wins is order-
        # dependent in BOTH engines' own ways
        seen = {}
        for j, (u, t, p) in enumerate(rs):
            seen[(u, t)] = (cid * 10 + u, j, t, p)
        right_rows.extend(seen.values())
    left = spark.createDataFrame(left_rows, "uid long, row_id long, t long")
    right = spark.createDataFrame(
        right_rows or [(None, None, None, None)],
        "uid long, ref_id long, t long, payload long",
    ).filter(F.col("uid").isNotNull())
    got = asof_join(left, right, "uid", "t", ["payload"])
    got_map = {
        (r["uid"], r["row_id"], r["t"]): r["payload_asof"]
        for r in got.collect()
    }
    lp = pd.DataFrame(left_rows, columns=["uid", "row_id", "t"]).sort_values(
        "t", kind="mergesort"
    )
    rp = pd.DataFrame(
        right_rows, columns=["uid", "ref_id", "t", "payload"]
    ).sort_values("t", kind="mergesort")
    if len(rp):
        m = pd.merge_asof(
            lp, rp[["uid", "t", "payload"]], on="t", by="uid",
            direction="backward", suffixes=("", "_r"),
        )
        exp = {
            (r.uid, r.row_id, r.t): (
                None if pd.isna(r.payload) else int(r.payload)
            )
            for r in m.itertuples()
        }
    else:
        exp = {(r.uid, r.row_id, r.t): None for r in lp.itertuples()}
    assert got_map == exp


def test_gapfill_interpolate_lines_and_edges(spark):
    from product_etl_spark.operators.timeseries import gapfill_interpolate
    import datetime as dt

    d = dt.date
    rows = [
        (1, d(2024, 1, 1), 10.0),
        (1, d(2024, 1, 4), 40.0),   # gap 2,3 -> 20, 30
        (1, d(2024, 1, 6), 0.0),    # gap 5 -> 20
        (2, d(2024, 2, 1), 5.0),    # singleton span: no gaps
    ]
    df = spark.createDataFrame(rows, "k int, day date, v double")
    got = {
        (r["k"], r["day"].isoformat()): (r["v_filled"], r["is_gap"])
        for r in gapfill_interpolate(df, "k", "day", "v").collect()
    }
    assert got[(1, "2024-01-02")] == (20.0, 1)
    assert got[(1, "2024-01-03")] == (30.0, 1)
    assert got[(1, "2024-01-05")] == (20.0, 1)
    assert got[(1, "2024-01-01")] == (10.0, 0)
    assert got[(1, "2024-01-06")] == (0.0, 0)
    assert got[(2, "2024-02-01")] == (5.0, 0)
    assert len(got) == 7
