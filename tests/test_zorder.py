"""Z-order layout: the written files must be clustered on EVERY
z-ordered dimension (measured from real parquet footer min-max
stats), where a single-column sort clusters only its own column."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from product_etl_spark.operators.zorder import interleave_bits, write_zordered


def _file_stat_spread(path: str, col: str) -> float:
    """Mean per-file (max-min) width of ``col``, from parquet
    footers — exactly the stats a scan uses to skip files."""
    widths = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f)
        idx = md.schema_arrow.get_field_index(col)
        stats = [
            md.metadata.row_group(i).column(idx).statistics
            for i in range(md.metadata.num_row_groups)
        ]
        widths.append(max(s.max for s in stats) - min(s.min for s in stats))
    assert widths
    return sum(widths) / len(widths)


def test_interleave_bits_known_values(spark):
    df = spark.range(1).select(
        interleave_bits([F.lit(0b11), F.lit(0b00)], bits=2).alias("a"),
        interleave_bits([F.lit(0b10), F.lit(0b01)], bits=2).alias("b"),
    )
    row = df.first()
    # x bits at even positions, y bits at odd:
    # (x=11, y=00) -> 0101; (x=10, y=01) -> y0=1@pos1, x1=1@pos2 = 0110
    assert row.a == 0b0101
    assert row.b == 0b0110


def test_zorder_clusters_both_dimensions(spark, tmp_path):
    n = 40_000
    # two independent uniform dims: a 1-D sort can't cluster both
    df = (
        spark.range(n)
        .select(
            (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 7), 16, 10)
             .cast("long") % 10_000).cast("double").alias("x"),
            (F.conv(F.substring(F.md5(F.col("id").cast("string")), 9, 7), 16, 10)
             .cast("long") % 10_000).cast("double").alias("y"),
        )
    )
    plain, xsort, zord = (
        str(tmp_path / "plain"), str(tmp_path / "xsort"), str(tmp_path / "zord")
    )
    df.repartition(16).write.parquet(plain)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(xsort)
    write_zordered(df, zord, ["x", "y"], n_files=16, bits=4)

    # unsorted files span ~the whole domain on both dims
    assert _file_stat_spread(plain, "x") > 9_000
    # x-sort clusters x but leaves y unclustered
    assert _file_stat_spread(xsort, "x") < 2_000
    assert _file_stat_spread(xsort, "y") > 9_000
    # z-order clusters BOTH dims well below the unsorted spread
    assert _file_stat_spread(zord, "x") < 5_000
    assert _file_stat_spread(zord, "y") < 5_000
