"""Subject erasure across tables + ingest-side suppression."""

from __future__ import annotations

import pytest

from product_etl_spark.operators.erasure import apply_suppression, erase_subjects
from product_etl_spark.operators.upsert import ConcurrentWriteError, _table_write_lock


def _write(spark, path, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(path)


def test_erase_across_tables_idempotent_and_suppressing(spark, tmp_path):
    t1 = str(tmp_path / "orders_t")
    t2 = str(tmp_path / "events_t")
    sup = str(tmp_path / "suppression")
    _write(spark, t1, [(1, "a"), (2, "b"), (3, "c")], "custkey int, v string")
    _write(spark, t2, [(10, 1), (11, 1), (12, 3), (13, 4)],
           "event_id int, user_key int")

    subjects = spark.createDataFrame([(1,), (9,)], "k int")
    tables = [
        {"path": t1, "key_col": "custkey"},
        {"path": t2, "key_col": "user_key"},
    ]
    report = erase_subjects(spark, subjects, tables, suppression_path=sup)
    assert report == {t1: 1, t2: 2}
    assert sorted(r["custkey"] for r in spark.read.parquet(t1).collect()) == [2, 3]
    assert sorted(r["event_id"] for r in spark.read.parquet(t2).collect()) == [12, 13]

    # rerun: nothing left to delete (and untouched tables not rewritten)
    again = erase_subjects(spark, subjects, tables, suppression_path=sup)
    assert again == {t1: 0, t2: 0}

    # ingest-side: a new batch re-introducing subject 1 is suppressed
    batch = spark.createDataFrame([(1, "again"), (5, "new")],
                                  "custkey int, v string")
    kept = apply_suppression(batch, spark, sup, "custkey")
    assert [r["custkey"] for r in kept.collect()] == [5]
    # absent list: no-op
    kept2 = apply_suppression(batch, spark, str(tmp_path / "nolist"), "custkey")
    assert kept2.count() == 2


def test_erasure_respects_single_writer_lock(spark, tmp_path):
    t1 = str(tmp_path / "tbl")
    _write(spark, t1, [(1, "a")], "custkey int, v string")
    subjects = spark.createDataFrame([(1,)], "k int")
    with _table_write_lock(t1):  # an upsert holds the table
        with pytest.raises(ConcurrentWriteError):
            erase_subjects(spark, subjects, [{"path": t1, "key_col": "custkey"}])
    # table untouched by the failed erasure
    assert spark.read.parquet(t1).count() == 1
