"""CDC changelog application (operators/changelog.py)."""

from __future__ import annotations

from product_etl_spark.operators.changelog import apply_changelog


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_latest_version_wins_and_delete_removes(spark):
    log = spark.createDataFrame(
        [
            # k=1: I then U -> latest payload survives
            (1, 1, "I", "a", 10),
            (1, 2, "U", "a2", 11),
            # k=2: delete last -> absent
            (2, 1, "I", "b", 20),
            (2, 2, "D", None, None),
            # k=3: deleted then re-inserted -> present with new payload
            (3, 1, "I", "c", 30),
            (3, 2, "D", None, None),
            (3, 3, "I", "c2", 31),
            # k=4: lowercase ops, Debezium 'c'
            (4, 1, "c", "d", 40),
            (4, 2, "u", "d2", 41),
        ],
        ["k", "version", "op", "name", "val"],
    )
    out = apply_changelog(log, ["k"])
    assert out.columns == ["k", "name", "val"]
    assert _rows(out) == [(1, "a2", 11), (3, "c2", 31), (4, "d2", 41)]


def test_replay_idempotent(spark):
    """Applying the same log twice (at-least-once delivery) yields the
    identical snapshot — duplicates collapse in the max-struct."""
    log = spark.createDataFrame(
        [(1, 1, "I", 5), (1, 2, "U", 6), (2, 3, "D", None)],
        ["k", "version", "op", "val"],
    )
    once = _rows(apply_changelog(log, ["k"]))
    twice = _rows(apply_changelog(log.unionAll(log), ["k"]))
    assert once == twice == [(1, 6)]


def test_composite_key(spark):
    log = spark.createDataFrame(
        [(1, "x", 1, "I", 1), (1, "y", 1, "I", 2), (1, "x", 2, "D", None)],
        ["k1", "k2", "version", "op", "val"],
    )
    assert _rows(apply_changelog(log, ["k1", "k2"])) == [(1, "y", 2)]


def test_one_shuffle_partial_agg_plan(spark):
    """Scale assertion: the snapshot is ONE key shuffle with map-side
    partial aggregation and no Window. (Spark plans struct-max as
    SortAggregate — a streaming per-partition sort, not a per-key
    history materialization.)"""
    log = spark.createDataFrame(
        [(1, 1, "I", 5)], ["k", "version", "op", "val"]
    )
    plan = (
        apply_changelog(log, ["k"])._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert plan.count("Exchange") == 1
    assert "partial_max" in plan


def test_changelog_catalog_matches_oracle(spark, sf_dir):
    from product_etl_spark.plans import CATALOG
    from product_etl_spark.plans.parity import compare

    spec = CATALOG["q134_changelog_snapshot"]
    ok, msg = compare(spec["fn"](spark, sf_dir), spec["oracle"], sf_dir)
    assert ok, msg
