"""Customer segmentation: RFM (recency / frequency / monetary)
quintile scoring — the classic warehouse segmentation report (Hughes
1994; every CRM ships it) computed with scale-safe global ranks.

Reference parity: the reference moves order rows but computes no
customer analytics; this extends the same analytics family as the
cohort/SCD and attribution entries.

Scale shape (why this survives 100 TB):
- One orders groupBy(customer) builds the per-customer triple.
- All THREE dimensions rank in ONE fused two-level pass (r15): the
  axes union into (ck, axis, value) rows, one repartitionByRange on
  (axis, value, ck) clusters each axis contiguously, and one
  k-bounded per-(partition, axis) size collect yields every axis's
  rank offsets AND n_customers — NEVER the single-task
  `row_number() OVER (ORDER BY ...)` window (the oracle replays that
  shape because DuckDB is single-node anyway).
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
    base = orders.groupBy(F.col(cust_col).alias("ck")).agg(
        F.max(ts_col).alias("_last"),
        F.count(F.lit(1)).alias("_freq"),
        F.sum(F.col(amount_col).cast("decimal(18,2)")).alias("_mon"),
    )

    # every "best first" dimension ranks by its NEGATION: recency by
    # -epoch_us(last order), frequency by -count, monetary by -spend.
    base = base.select(
        "ck",
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

    # ONE fused rank pass for all three axes (r15, guide §2.4): the
    # old shape chained three sequential global_sort_ranks — three
    # range exchanges, three offsets collects, plus a COUNT(*) job
    # and broadcast for n. Here the three (ck, axis, value) framings
    # union into one frame, one repartitionByRange on
    # (axis, value, ck) clusters each axis contiguously, and one
    # per-(partition, axis) size collect yields BOTH every axis's
    # two-level rank offsets AND n_customers (any axis's total).
    # Values compare within one axis only, so casting the bigint
    # axes to the decimal type of the monetary axis (exact) just
    # gives the union one sort key type.
    vt = "decimal(38,6)"
    axes = (
        base.select(
            "ck", F.lit(0).alias("_ax"), F.col("_negr").cast(vt).alias("_v")
        )
        .unionByName(
            base.select(
                "ck", F.lit(1).alias("_ax"), F.col("_negf").cast(vt).alias("_v")
            )
        )
        .unionByName(
            base.select(
                "ck", F.lit(2).alias("_ax"), F.col("_negm").cast(vt).alias("_v")
            )
        )
    )
    parts = int(
        base.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    local = (
        axes.repartitionByRange(parts, F.col("_ax"), F.col("_v"), F.col("ck"))
        .sortWithinPartitions("_ax", "_v", "ck")
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftright(F.col("_mid"), 33))
        .withColumn("_lrn", F.col("_mid") % F.lit(1 << 33))
        .drop("_mid")
        .localCheckpoint(eager=False)
    )
    sizes = (
        local.groupBy("_pid", "_ax").agg(F.count(F.lit(1)).alias("_n")).collect()
    )
    n_total = sum(r["_n"] for r in sizes if r["_ax"] == 0)
    # within a partition rows sort (axis, value, ck), so an axis's
    # rows are one contiguous run: rank = _lrn - (run start in this
    # partition) + (axis rows in earlier partitions) + 1. Both maps
    # come from the one k-bounded sizes collect.
    start_in_pid: dict[tuple[int, int], int] = {}
    axis_before: dict[tuple[int, int], int] = {}
    by_pid: dict[int, list] = {}
    for r in sizes:
        by_pid.setdefault(r["_pid"], []).append(r)
    acc_axis = {0: 0, 1: 0, 2: 0}
    for pid in sorted(by_pid):
        run = 0
        for r in sorted(by_pid[pid], key=lambda r: r["_ax"]):
            start_in_pid[(pid, r["_ax"])] = run
            axis_before[(pid, r["_ax"])] = acc_axis[r["_ax"]]
            run += r["_n"]
            acc_axis[r["_ax"]] += r["_n"]
    # O(1) positional lookup: a literal ARRAY indexed by pid*3+axis
    # (a literal MAP's GetMapValue scans linearly per row)
    n_keys = (max(by_pid) + 1) * 3 if by_pid else 0
    sarr = [0] * n_keys
    barr = [0] * n_keys
    for (pid, ax), v in start_in_pid.items():
        sarr[pid * 3 + ax] = int(v)
    for (pid, ax), v in axis_before.items():
        barr[pid * 3 + ax] = int(v)
    key = (F.col("_pid") * 3 + F.col("_ax") + 1).cast("int")
    sx = F.array(*[F.lit(v).cast("bigint") for v in sarr]) if sarr else F.array()
    bx = F.array(*[F.lit(v).cast("bigint") for v in barr]) if barr else F.array()
    rank = (
        F.col("_lrn") - F.element_at(sx, key) + F.element_at(bx, key) + 1
    ).cast("bigint")
    n_lit = int(max(n_total, 1))
    # integer DIV semantics, exactly the old per-axis expression:
    # score = (n_buckets + 1) - (((rank - 1) * n_buckets) DIV n + 1)
    score = F.lit(n_buckets + 1) - F.expr(
        f"CAST(((_rank - 1) * {int(n_buckets)}) DIV {n_lit} + 1 AS INT)"
    )
    scores = (
        local.select("ck", "_ax", rank.alias("_rank"))
        .select("ck", "_ax", score.alias("_score"))
        .groupBy("ck")
        .agg(
            F.max(F.when(F.col("_ax") == 0, F.col("_score"))).alias("r_score"),
            F.max(F.when(F.col("_ax") == 1, F.col("_score"))).alias("f_score"),
            F.max(F.when(F.col("_ax") == 2, F.col("_score"))).alias("m_score"),
        )
    )
    return (
        base.select("ck", "_mon")
        .join(scores, "ck")
        .groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(F.sum("_mon").cast("double"), 2).alias(
                "total_monetary"
            ),
        )
        .orderBy("r_score", "f_score", "m_score")
    )
