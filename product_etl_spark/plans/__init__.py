from product_etl_spark.plans.catalog import CATALOG, oracle_sql, queries  # noqa: F401
