"""Excel ingest (reference S3: utils/importer/importer_etl.py:31,
utils/importer/automapper.py:27 — ``pd.read_excel(path, sheet 0)``).

No Excel engine is baked into this container (openpyxl absent) and
no spark-excel jar, so the reader is gated: with openpyxl present it
reads via pandas in the driver and parallelizes with
``createDataFrame`` (Excel files are small driver-side artifacts —
mapping workbooks, not fact data; the 100 TB path is CSV/Parquet).
Without it, a clear error instead of a deep ImportError.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from product_etl_spark.sources.csv_reader import ROW_IDX


def read_excel(
    spark: SparkSession, path: str, sheet: int | str = 0
) -> DataFrame:
    try:
        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=sheet, dtype=str)
    except ImportError as e:  # openpyxl/xlrd not installed
        raise NotImplementedError(
            "Excel ingest needs openpyxl (not available in this "
            "environment); convert the workbook to CSV and use "
            "sources.read_raw_products"
        ) from e
    pdf.columns = [str(c) for c in pdf.columns]
    df = spark.createDataFrame(pdf.where(pdf.notna(), None))
    return df.withColumn(ROW_IDX, F.monotonically_increasing_id())
