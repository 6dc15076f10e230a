"""Streaming product ingest: drop CSV files, drain with availableNow,
warehouse tables merge incrementally and exactly-once."""

from __future__ import annotations

from pyspark.sql import functions as F

from product_etl_spark.streaming.pipeline import stream_ingest_csv

HEADER_COLS = ["Master Code", "SKU Code", "Product Name", "Price", "Inventory"]
HEADER = ";".join(HEADER_COLS)


def _drop_file(path, name, rows):
    (path / name).write_text(HEADER + "\n" + "\n".join(rows), encoding="utf-8")


def _drain(spark, src, wh, ckpt):
    q = stream_ingest_csv(spark, str(src), str(wh), str(ckpt), HEADER_COLS)
    q.awaitTermination()


def test_incremental_file_ingest(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    wh = tmp_path / "wh"
    ckpt = tmp_path / "ckpt"

    _drop_file(src, "batch1.csv", [
        "m1;s1;沙发;100;5",
        "m1;s2;;120;3",
    ])
    _drain(spark, src, wh, ckpt)
    coll = spark.read.parquet(str(wh / "product_collection"))
    prod = spark.read.parquet(str(wh / "product"))
    assert coll.count() == 1 and prod.count() == 1

    # drain again with nothing new: no change (checkpointed file log)
    _drain(spark, src, wh, ckpt)
    assert spark.read.parquet(str(wh / "product")).count() == 1

    # new export arrives: new collection merged, old untouched
    _drop_file(src, "batch2.csv", [
        "m2;s3;地毯;50;9",
        "m2;s4;;60;2",
        "m1;s1;沙发;100;7",  # replay of m1 template (inventory changed)
    ])
    _drain(spark, src, wh, ckpt)
    coll2 = {r["master_code"]: r for r in spark.read.parquet(str(wh / "product_collection")).collect()}
    assert set(coll2) == {"m1", "m2"}
    assert coll2["m1"]["inventory"] == 7  # upsert refreshed the replayed row
    prods = {r["sku"] for r in spark.read.parquet(str(wh / "product")).collect()}
    assert prods == {"s2", "s4"}


def test_multi_file_batch_orders_by_file_name(spark, tmp_path):
    """One availableNow micro-batch holding TWO files: template
    selection must follow (file name, in-file position) order — not
    partition layout — so checkpoint replays MERGE identical values."""
    src = tmp_path / "incoming2"
    src.mkdir()
    wh = tmp_path / "wh2"
    ckpt = tmp_path / "ckpt2"

    # file 01 holds the m9 template row; file 02 only variants. If the
    # batch were ordered by partition layout, 02's row could win.
    _drop_file(src, "export_01.csv", ["m9;tpl-sku;模板;10;1"])
    _drop_file(src, "export_02.csv", ["m9;var-sku;;20;2"])
    _drain(spark, src, wh, ckpt)

    coll = spark.read.parquet(str(wh / "product_collection")).collect()
    assert len(coll) == 1 and coll[0]["inventory"] == 1  # template = file 01 row
    prods = {r["sku"] for r in spark.read.parquet(str(wh / "product")).collect()}
    assert prods == {"var-sku"}
