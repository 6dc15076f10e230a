from product_etl_spark.plans.catalog import CATALOG, oracle_sql, queries  # noqa: F401
from product_etl_spark.plans import catalog_ext  # noqa: F401  (registers q41+)
