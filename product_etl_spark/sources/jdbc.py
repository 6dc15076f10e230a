"""JDBC source/sink wrappers (reference S4/S12: driving-set scans
``SELECT ... FROM custom_attributes_raw``
(utils/custom_attributes_parser.py:8) and execute_values bulk inserts
(utils/importer/ETL.py:7)).

Our engine's canonical storage is Parquet; these wrappers exist for
interop with the reference's PostgreSQL world. Exercised end-to-end
against embedded Derby (the JDBC database Spark ships for its Hive
metastore) in tests/test_jdbc.py: batched write, unpartitioned and
bounded-partition reads, append. Explicit about partitioned reads so
a 100 TB-adjacent fact table never funnels through one connection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 16,
    **options: str,
) -> DataFrame:
    """Partitioned JDBC scan. Always pass partition bounds for any
    table that doesn't fit in one executor's memory — an unpartitioned
    JDBC read is a single-task scan."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 1000,
    **options: str,
) -> None:
    """Batched JDBC append (the execute_values path, S12). Upsert
    semantics against a live DB need a staging table + server-side
    MERGE; this writer covers the bulk-load leg."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
