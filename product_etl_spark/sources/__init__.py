from product_etl_spark.sources.csv_reader import read_raw_products  # noqa: F401
from product_etl_spark.sources.mapping import (  # noqa: F401
    load_mapping,
    projection_for_table,
)
