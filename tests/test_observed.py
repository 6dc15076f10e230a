"""One-pass observe quality gate: metrics ride the write job (no
second scan), a failing gate publishes NOTHING, a passing gate
publishes atomically."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from product_etl_spark.operators.observed import (
    QualityGateError,
    standard_checks,
    write_with_quality_gate,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def test_passing_gate_publishes_and_returns_metrics(spark, tmp_path):
    path = str(tmp_path / "tbl")
    metrics = write_with_quality_gate(
        _df(spark, [(1, "a"), (2, "b"), (3, None)]),
        path,
        {
            "n_rows": (F.count(F.lit(1)), lambda v: v >= 3),
            "null_v": (F.count_if(F.col("v").isNull()), lambda v: v <= 1),
        },
    )
    assert metrics == {"n_rows": 3, "null_v": 1}
    assert spark.read.parquet(path).count() == 3


def test_failing_gate_publishes_nothing_and_reports_values(spark, tmp_path):
    path = str(tmp_path / "tbl")
    with pytest.raises(QualityGateError, match="null_v=2"):
        write_with_quality_gate(
            _df(spark, [(1, None), (2, None), (3, "c")]),
            path,
            {"null_v": (F.count_if(F.col("v").isNull()), lambda v: v == 0)},
        )
    assert not os.path.exists(path)  # nothing published
    assert not [p for p in tmp_path.iterdir()]  # staging cleaned


def test_failing_gate_preserves_previous_table_state(spark, tmp_path):
    """A bad batch must not destroy the good table it would have
    replaced — the swap only happens after the gate passes."""
    path = str(tmp_path / "tbl")
    write_with_quality_gate(
        _df(spark, [(1, "a")]), path,
        {"n": (F.count(F.lit(1)), lambda v: v == 1)},
    )
    with pytest.raises(QualityGateError):
        write_with_quality_gate(
            _df(spark, [(9, None)]), path,
            {"null_v": (F.count_if(F.col("v").isNull()), lambda v: v == 0)},
        )
    got = spark.read.parquet(path).collect()
    assert [(r["k"], r["v"]) for r in got] == [(1, "a")]


def test_gate_is_one_pass_no_second_scan(spark, tmp_path):
    """The audit must ride the write job: exactly ONE job touches the
    input (observe metrics accumulate on the write), not a
    count-then-write pair."""
    from pyspark.sql import Observation

    path = str(tmp_path / "tbl")
    src = str(tmp_path / "src")
    _df(spark, [(i, "x") for i in range(10)]).write.parquet(src)
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    write_with_quality_gate(
        spark.read.parquet(src),
        path,
        {"n": (F.count(F.lit(1)), lambda v: v == 10)},
    )
    after = tracker.getJobIdsForGroup(None)
    new_jobs = set(after) - set(before)
    # one write job (+ possibly a tiny commit/refresh job, never a
    # second full-scan aggregate job): strictly fewer than the 2
    # full-pass jobs a count-then-write shape costs
    assert len(new_jobs) <= 2, new_jobs


def test_standard_checks_gate_null_fraction(spark, tmp_path):
    path = str(tmp_path / "tbl")
    ok = _df(spark, [(1, "a"), (2, "b")])
    metrics = write_with_quality_gate(
        ok, path, standard_checks("k", min_rows=2)
    )
    assert metrics["n_rows"] == 2 and metrics["null_keys"] == 0

    bad = spark.createDataFrame([(None, "a"), (2, "b")], "k int, v string")
    with pytest.raises(QualityGateError, match="_null_key_ok"):
        write_with_quality_gate(
            bad, str(tmp_path / "tbl2"), standard_checks("k", min_rows=1)
        )


def test_append_mode_rejected_loudly(spark, tmp_path):
    with pytest.raises(ValueError, match="append-shaped"):
        write_with_quality_gate(
            _df(spark, [(1, "a")]),
            str(tmp_path / "tbl"),
            {"n": (F.count(F.lit(1)), lambda v: True)},
            mode="append",
        )
    assert not [p for p in tmp_path.iterdir()]  # rejected BEFORE any write
    with pytest.raises(ValueError, match="state the gate"):
        write_with_quality_gate(
            _df(spark, [(1, "a")]), str(tmp_path / "tbl"), {}
        )


def test_raising_predicate_cleans_staging(spark, tmp_path):
    """A user predicate that RAISES (not just fails) must not leave
    {path}__staging_* litter beside the table — any non-publish exit
    rmtrees staging before the exception propagates."""
    path = str(tmp_path / "tbl")

    def bad_pred(v):
        raise RuntimeError("predicate blew up")

    with pytest.raises(RuntimeError, match="predicate blew up"):
        write_with_quality_gate(
            _df(spark, [(1, "a")]),
            path,
            {"n_rows": (F.count(F.lit(1)), bad_pred)},
        )
    assert not os.path.exists(path)
    assert not [p for p in tmp_path.iterdir()]  # staging cleaned
