"""applyInPandasWithState: running totals persist across drains."""

from __future__ import annotations

import datetime as dt

from product_etl_spark.streaming.pipeline import (
    stream_user_running_totals,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"
BASE = dt.datetime(2024, 1, 1, 10, 0, 0)


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(path)


def _drain(spark, src, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)

    def sink(batch_df, batch_id):
        # update-mode output -> parquet via foreachBatch (file sinks
        # are append-only)
        batch_df.write.mode("append").parquet(out)

    q = (
        stream_user_running_totals(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_state_survives_across_batches(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    _write(spark, src, [
        (1, BASE, 1, "click", 10.0),
        (2, BASE, 1, "view", 5.0),
        (3, BASE, 2, "click", 1.0),
    ])
    _drain(spark, src, out, ckpt)
    rows = {r["user_id"]: r for r in spark.read.parquet(out).collect()}
    assert rows[1]["n_events"] == 2 and rows[1]["total_value"] == 15.0
    assert rows[2]["n_events"] == 1

    # second batch: totals continue from persisted state
    _write(spark, src, [(4, BASE + dt.timedelta(minutes=1), 1, "click", 2.5)])
    _drain(spark, src, out, ckpt)
    latest = [
        r
        for r in spark.read.parquet(out).collect()
        if r["user_id"] == 1 and r["n_events"] == 3
    ]
    assert latest and latest[0]["total_value"] == 17.5


def test_stream_dedup_within_watermark(spark, tmp_path):
    from product_etl_spark.streaming.pipeline import (
        run_available_now,
        stream_dedup_events,
    )

    src, out, ckpt = (str(tmp_path / d) for d in ("dsrc", "dout", "dckpt"))
    _write(spark, src, [
        (1, BASE, 1, "click", 1.0),
        (1, BASE, 1, "click", 1.0),  # duplicate delivery
        (2, BASE, 2, "view", 2.0),
        (1, BASE + dt.timedelta(minutes=5), 1, "click", 1.0),  # dup within horizon
    ])
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    run_available_now(stream_dedup_events(stream), out, ckpt)
    rows = spark.read.parquet(out).collect()
    assert sorted(r["event_id"] for r in rows) == [1, 2]


def test_stream_static_dimension_join(spark, tmp_path):
    from product_etl_spark.streaming.pipeline import (
        run_available_now,
        stream_enrich_with_dimension,
    )

    src, out, ckpt = (str(tmp_path / d) for d in ("jsrc", "jout", "jckpt"))
    _write(spark, src, [(1, BASE, 1, "click", 1.0), (2, BASE, 99, "view", 2.0)])
    dim = spark.createDataFrame([(1, "alice")], "user_id long, user_name string")
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    run_available_now(
        stream_enrich_with_dimension(stream, dim, "user_id"), out, ckpt
    )
    rows = {r["event_id"]: r["user_name"] for r in spark.read.parquet(out).collect()}
    assert rows == {1: "alice", 2: None}
