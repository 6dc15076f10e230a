from product_etl_spark.operators.incremental import only_unprocessed  # noqa: F401
from product_etl_spark.operators.split import split_master_variants  # noqa: F401
from product_etl_spark.operators.upsert import upsert_parquet  # noqa: F401
