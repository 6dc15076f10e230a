"""Customer segmentation: RFM (recency / frequency / monetary)
quintile scoring — the classic warehouse segmentation report (Hughes
1994; every CRM ships it) computed with scale-safe global ranks.

Reference parity: the reference moves order rows but computes no
customer analytics; this extends the same analytics family as the
cohort/SCD and attribution entries.

Scale shape (why this survives 100 TB):
- One orders groupBy(customer) builds the per-customer triple.
- Each dimension's quintile comes from linkage.global_sort_ranks
  (repartitionByRange + per-partition offsets) — NEVER the
  single-task `row_number() OVER (ORDER BY ...)` window (the oracle
  replays that shape because DuckDB is single-node anyway).
- The bucket id is pure integer arithmetic on (rank, n_customers);
  the report aggregate is bounded by 5^3 segments.

Float policy: monetary sums as DECIMAL(18,2) (exact, order-free —
the q161 moment recipe) and is surfaced as a rounded DOUBLE; every
score is integer-decided (rank ties broken by customer key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rfm_segments(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    n_buckets: int = 5,
) -> DataFrame:
    """RFM segment report: (r_score, f_score, m_score, n_customers,
    total_monetary) — one row per populated segment, scores 1..n
    with n = best (most recent / most orders / highest spend).

    Recency ranks by the customer's LAST order instant descending
    (no day arithmetic — the rank is what the score needs);
    frequency by order count descending; monetary by exact-decimal
    spend descending. Ties always break by the customer key, so
    every score is integer-decided and any engine replays it.
    """
    from product_etl_spark.operators.linkage import global_sort_ranks

    base = orders.groupBy(F.col(cust_col).alias("ck")).agg(
        F.max(ts_col).alias("_last"),
        F.count(F.lit(1)).alias("_freq"),
        F.sum(F.col(amount_col).cast("decimal(18,2)")).alias("_mon"),
    )
    n = base.agg(F.count(F.lit(1)).alias("_n"))

    # global_sort_ranks takes column NAMES and sorts ascending, so
    # every "best first" dimension ranks by its NEGATION: recency by
    # -epoch_us(last order), frequency by -count, monetary by -spend.
    base = base.select(
        "ck",
        "_freq",
        "_mon",
        # explicit TIMESTAMP cast: unix_micros on a DATE column would
        # otherwise rely on an implicit session-timezone-dependent
        # coercion — the rank only needs monotonicity (midnight-local
        # epochs are monotone in the date under any fixed zone), but
        # the cast documents the intent and survives a column-type
        # change (ADVICE r11)
        (-F.unix_micros(F.col("_last").cast("timestamp"))).alias("_negr"),
        (-F.col("_freq")).alias("_negf"),
        (-F.col("_mon")).alias("_negm"),
    )

    def _score(df: DataFrame, order_name: str, out: str) -> DataFrame:
        ranked = global_sort_ranks(df, [order_name, "ck"], "_rank")
        return (
            ranked.crossJoin(F.broadcast(n))
            .withColumn(
                out,
                F.lit(n_buckets + 1)
                - F.expr(
                    f"CAST(((_rank - 1) * {n_buckets}) DIV _n + 1 AS INT)"
                ),
            )
            .drop("_rank", "_n")
        )

    # rank 1 = best -> bucket 1 -> score n_buckets
    scored = _score(base, "_negr", "r_score")
    scored = _score(scored, "_negf", "f_score")
    scored = _score(scored, "_negm", "m_score")
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(F.sum("_mon").cast("double"), 2).alias(
                "total_monetary"
            ),
        )
        .orderBy("r_score", "f_score", "m_score")
    )
