"""Second extension catalog (q81+): the remaining classic TPC-H
shapes expressible over the driver's synthetic schema (Q7/Q8/Q9/Q13/
Q14/Q15/Q17/Q18/Q19/Q22, adapted where the synthetic tables lack a
column — adaptations noted per query), plus catalog entries for the
round-2 training-data operators (exact-substring segment dedup,
embedding-cosine near-dup, k-means IVF).

Same registry/determinism contract as catalog.py: exact decimal
arithmetic for every reorderable sum, DOUBLE only at the surface,
total-order tiebreaks on every top-k, and threshold comparisons done
in integer/decimal space (``5*qty*cnt < sum`` instead of
``qty < 0.2*sum/cnt``) so no float-division boundary can flip
membership between engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from product_etl_spark.operators import dedup as D
from product_etl_spark.operators import similarity as SIM
from product_etl_spark.plans.catalog import _t, dec, register

_TS = lambda s: F.lit(s).cast("timestamp")  # noqa: E731


@register(
    "q81_tpch_q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(vol) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INT) AS l_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l.l_discount AS DECIMAL(18,2)) AS vol
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q81_tpch_q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 (volume shipping): bidirectional nation-pair trade
    volume by ship year. Scale shape: both nation dims broadcast; the
    pair disjunction references both sides, so it evaluates as the
    residual condition of the second nation join — the earliest
    point where both attributes exist (executed plan: the
    BroadcastHashJoin on _c_nk carries it) — and the date band is
    pushed to the lineitem scan. At 25 nations the unfiltered dim
    broadcast is noise; a huge dimension would warrant pre-filtering
    each side to the pair's two nations."""
    s, li, o, cu, n = _t(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    n1 = n.select(
        F.col("n_nationkey").alias("_s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("_c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.filter(
            (F.col("l_shipdate") >= _TS("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _TS("1998-01-01 00:00:00"))
        )
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(cu, cu.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("_s_nk") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("_c_nk") == F.col("c_nationkey"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))).alias(
                "vol"
            ),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.sum("vol").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q82_tpch_q8_market_share",
    """
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN vol
                               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM(vol) AS DOUBLE), 4) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l.l_discount AS DECIMAL(18,2)) AS vol,
             n1.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n2.n_regionkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    )
    GROUP BY o_year
    """,
)
def q82_tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8 (national market share): NATION_3's share of ASIA's
    PROMO-part import volume per order year. The share is a ratio of
    two exact decimal sums, surfaced as ROUND(double/double, 4) —
    bit-identical across engines because both operands are exact.
    Part/nation/region dims broadcast; only lineitem-orders-customer
    shuffle."""
    p, li, s, o, cu, n, r = _t(
        spark,
        sf_dir,
        "part",
        "lineitem",
        "supplier",
        "orders",
        "customer",
        "nation",
        "region",
    )
    n1 = n.select(
        F.col("n_nationkey").alias("_s_nk"), F.col("n_name").alias("nation")
    )
    n2 = n.select("n_nationkey", "n_regionkey")
    return (
        li.join(F.broadcast(p.filter(F.col("p_type") == "PROMO")), p.p_partkey == li.l_partkey)
        .join(
            o.filter(
                (F.col("o_orderdate") >= _TS("1995-01-01 00:00:00"))
                & (F.col("o_orderdate") < _TS("1997-01-01 00:00:00"))
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(cu, cu.c_custkey == F.col("o_custkey"))
        .join(F.broadcast(n2), n2.n_nationkey == cu.c_nationkey)
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("r_regionkey") == n2.n_regionkey,
        )
        .join(s, s.s_suppkey == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("_s_nk") == s.s_nationkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            (dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))).alias(
                "vol"
            ),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == "NATION_3", F.col("vol")).otherwise(
                        F.lit(0).cast("decimal(18,4)")
                    )
                ).cast("double")
                / F.sum("vol").cast("double"),
                4,
            ).alias("mkt_share")
        )
    )


@register(
    "q83_tpch_q9_product_profit",
    """
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l.l_discount AS DECIMAL(18,2)) AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%widget%'
    )
    GROUP BY nation, o_year
    """,
)
def q83_tpch_q9_product_profit(spark, sf_dir):
    """TPC-H Q9 (product-type profit), adapted: the synthetic schema
    has no partsupp, so profit omits the ps_supplycost term and is
    gross revenue by supplier nation and order year for parts whose
    name matches '%widget%'. Part dim filtered *before* broadcast
    (LIKE pushed to the scan)."""
    p, li, s, o, n = _t(
        spark, sf_dir, "part", "lineitem", "supplier", "orders", "nation"
    )
    nn = n.select(
        F.col("n_nationkey").alias("_nk"), F.col("n_name").alias("nation")
    )
    return (
        li.join(
            F.broadcast(p.filter(F.col("p_name").like("%widget%"))),
            p.p_partkey == li.l_partkey,
        )
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nn), F.col("_nk") == s.s_nationkey)
        .select(
            "nation",
            F.year("o_orderdate").alias("o_year"),
            (dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))).alias(
                "amount"
            ),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
    )


@register(
    "q84_tpch_q13_order_count_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q84_tpch_q13_order_count_distribution(spark, sf_dir):
    """TPC-H Q13 (customer order-count distribution), adapted: the
    synthetic orders table has no o_comment, so the excluded class is
    '1-URGENT' orders instead of comment-matched ones. Exercises a
    filter *inside* a left-join condition (kept rows with zero
    matches survive with count 0) followed by a re-aggregation of the
    aggregate — two shuffles, both on uniform keys."""
    cu, o = _t(spark, sf_dir, "customer", "orders")
    return (
        cu.join(
            o,
            (o.o_custkey == cu.c_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "q85_tpch_q14_promo_revenue",
    """
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN vol
                                       ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM(vol) AS DOUBLE), 4) AS promo_revenue,
           COUNT(*) AS n_lines
    FROM (
      SELECT p.p_type,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l.l_discount AS DECIMAL(18,2)) AS vol
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    )
    """,
)
def q85_tpch_q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 (promotion effect): PROMO-typed share of one ship
    month's revenue. Single broadcast join + one global agg; the date
    band is pushed to the lineitem scan."""
    li, p = _t(spark, sf_dir, "lineitem", "part")
    return (
        li.filter(
            (F.col("l_shipdate") >= _TS("1997-09-01 00:00:00"))
            & (F.col("l_shipdate") < _TS("1997-10-01 00:00:00"))
        )
        .join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .select(
            "p_type",
            (dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))).alias(
                "vol"
            ),
        )
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", F.col("vol")).otherwise(
                        F.lit(0).cast("decimal(18,4)")
                    )
                ).cast("double")
                / F.sum("vol").cast("double"),
                4,
            ).alias("promo_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q86_tpch_q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(18,2))) AS total
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total AS DOUBLE) AS total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total = (SELECT MAX(total) FROM rev)
    """,
)
def q86_tpch_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 (top supplier): supplier(s) with the maximum quarter
    revenue. The max is an exact decimal, so the equality join is
    deterministic and ties surface identically in both engines. Scale
    shape: per-supplier aggregate -> single-row max aggregate
    broadcast back as an equi-join — no global sort, no window over
    the fact table."""
    li, s = _t(spark, sf_dir, "lineitem", "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= _TS("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _TS("1996-04-01 00:00:00"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))).alias(
                "total"
            )
        )
    )
    mx = rev.agg(F.max("total").alias("_mx"))
    return (
        rev.join(F.broadcast(mx), rev.total == F.col("_mx"))
        .join(s, s.s_suppkey == F.col("supplier_no"))
        .select(
            "s_suppkey", "s_name", F.col("total").cast("double").alias("total_revenue")
        )
    )


@register(
    "q87_tpch_q17_small_quantity_revenue",
    """
    WITH brand_lines AS (
      SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#1'
    ),
    pa AS (
      SELECT l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
             COUNT(*) AS cnt
      FROM brand_lines GROUP BY l_partkey
    )
    SELECT ROUND(CAST(SUM(CAST(b.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / 7.0, 4) AS avg_yearly,
           COUNT(*) AS n_lines
    FROM brand_lines b JOIN pa ON pa.l_partkey = b.l_partkey
    WHERE CAST(b.l_quantity AS DECIMAL(18,2)) * 5 * pa.cnt < pa.sum_qty
    """,
)
def q87_tpch_q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue), adapted: the
    synthetic part has no p_container, so the population is one
    brand's lineitems. The `qty < 0.2*avg(qty)` predicate is
    rewritten in exact decimal space (`5*qty*cnt < sum_qty`) so no
    float division can flip a boundary row between engines. Scale
    shape: the per-part aggregate and the fact side both partition on
    l_partkey, so the join itself adds no third exchange (the two
    scans differ in projection, so the exchanges aren't literally
    reused); the brand dim broadcast prunes both."""
    li, p = _t(spark, sf_dir, "lineitem", "part")
    brand = li.join(
        F.broadcast(p.filter(F.col("p_brand") == "Brand#1")),
        p.p_partkey == li.l_partkey,
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    pa = brand.groupBy("l_partkey").agg(
        F.sum(dec("l_quantity")).alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        brand.join(pa, "l_partkey")
        .filter(dec("l_quantity") * F.lit(5) * F.col("cnt") < F.col("sum_qty"))
        .agg(
            F.round(F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0), 4).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q88_tpch_q18_large_volume_customers",
    """
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 120
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def q88_tpch_q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 (large-volume customers): orders whose total
    quantity clears a HAVING threshold, joined back to customer, top
    20 by price with a total-order tiebreak. Scale shape: the HAVING
    aggregate and the per-order re-aggregate both key on the order
    key so no extra repartition is introduced, the qualifying-order
    set flows as a semi-join, and the top-k is
    TakeOrderedAndProject."""
    cu, o, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("_sq"))
        .filter(F.col("_sq") > 120)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "_bk"), li.l_orderkey == F.col("_bk"), "left_semi")
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(cu, cu.c_custkey == o.o_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "q89_tpch_q19_bracketed_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q89_tpch_q19_bracketed_revenue(spark, sf_dir):
    """TPC-H Q19 (discounted revenue), adapted: p_container/shipmode
    don't exist, so the three OR-brackets pair brand with size and
    quantity bands. The disjunction spans both join sides, so it
    evaluates post-join, but the per-side implied filters (brand in
    set, qty in the union band) are derivable; the part dim
    broadcasts either way."""
    li, p = _t(spark, sf_dir, "lineitem", "part")
    j = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    br = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return j.filter(br).agg(
        F.sum(dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount")))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q90_tpch_q22_idle_balances",
    """
    WITH avgbal AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s, COUNT(*) AS c
      FROM customer WHERE c_acctbal > 0
    )
    SELECT n.n_name, COUNT(*) AS numcust,
           CAST(SUM(CAST(cu.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer cu
    JOIN nation n ON n.n_nationkey = cu.c_nationkey
    CROSS JOIN avgbal
    WHERE CAST(cu.c_acctbal AS DECIMAL(18,2)) * avgbal.c > avgbal.s
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = cu.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY n.n_name
    """,
)
def q90_tpch_q22_idle_balances(spark, sf_dir):
    """TPC-H Q22 (global sales opportunity), adapted: no c_phone in
    the synthetic schema, so grouping is by nation and the "no
    orders" class is "no urgent orders" (every synthetic customer has
    orders). The above-average test is exact-decimal cross-multiplied
    (`bal*cnt > sum`), the scalar aggregate broadcasts, and the
    exclusion is an anti-join with its predicate pushed to the orders
    scan."""
    cu, o, n = _t(spark, sf_dir, "customer", "orders", "nation")
    avgbal = cu.filter(F.col("c_acctbal") > 0).agg(
        F.sum(dec("c_acctbal")).alias("_s"), F.count(F.lit(1)).alias("_c")
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("_uk")
    )
    return (
        cu.crossJoin(F.broadcast(avgbal))
        .filter(dec("c_acctbal") * F.col("_c") > F.col("_s"))
        .join(urgent, F.col("_uk") == cu.c_custkey, "left_anti")
        .join(F.broadcast(n), n.n_nationkey == cu.c_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Round-2 training-data operators as driver-checkable queries


@register(
    "q91_segment_dedup",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(coalesce(text, '')), '\s+') AS t
      FROM documents
      WHERE len(string_split_regex(trim(coalesce(text, '')), '\s+')) > 0
    ),
    segs AS (
      SELECT doc_id, CAST(r.i AS INT) AS seg_idx,
             array_to_string(t[(CAST(r.i AS INT)*8+1):(CAST(r.i AS INT)*8+8)],
                             ' ') AS segment
      FROM toks CROSS JOIN
           UNNEST(range(CAST(ceil(len(t)/8.0) AS INT))) AS r(i)
    ),
    firsts AS (
      SELECT doc_id, seg_idx, segment,
             ROW_NUMBER() OVER (PARTITION BY md5(segment)
                                ORDER BY doc_id, seg_idx) AS rn
      FROM segs
    ),
    rebuilt AS (
      SELECT doc_id,
             md5(string_agg(segment, ' ' ORDER BY seg_idx)) AS text_md5,
             COUNT(*) AS n_segments_kept
      FROM firsts WHERE rn = 1 GROUP BY doc_id
    ),
    totals AS (SELECT doc_id, COUNT(*) AS n_segments FROM segs GROUP BY doc_id)
    SELECT r.doc_id, r.text_md5, r.n_segments_kept, t.n_segments,
           ROUND(1 - r.n_segments_kept / t.n_segments, 4) AS dup_ratio
    FROM rebuilt r JOIN totals t ON r.doc_id = t.doc_id
    """,
)
def q91_segment_dedup(spark, sf_dir):
    """Exact-substring segment dedup (Lee et al. ExactSubstr at fixed
    8-word granularity) over the documents corpus: later occurrences
    of an already-seen segment are dropped, documents rebuilt from
    survivors. The driver-facing projection hashes the rebuilt text
    (md5) so the compared rows stay narrow. Scale notes in
    operators/dedup.py:remove_duplicate_segments (min-struct
    first-occurrence — map-side combinable, no fingerprint-key
    window)."""
    d = _t(spark, sf_dir, "documents")
    res = D.remove_duplicate_segments(d, "text", "doc_id", seg_words=8)
    return res.select(
        "doc_id",
        F.md5(F.col("text")).alias("text_md5"),
        "n_segments_kept",
        "n_segments",
        "dup_ratio",
    )


@register(
    "q92_cosine_near_dup_pairs",
    """
    SELECT label, id_a, id_b, ROUND(sim, 4) AS cos_sim
    FROM (
      SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
             list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
             / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))
             AS sim
      FROM embeddings a
      JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    )
    WHERE sim >= 0.3
    """,
)
def q92_cosine_near_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (SemDeDup-style) blocked
    on the label column: within-block exact cosine, threshold 0.3.
    The block key bounds the self-join to O(sum block_size^2);
    unblocked corpora go through the LSH/IVF paths instead (see
    operators/similarity.py:cosine_near_dup_pairs docstring)."""
    e = _t(spark, sf_dir, "embeddings")
    return SIM.cosine_near_dup_pairs(
        e, "embedding", "vec_id", "label", threshold=0.3
    )


@register("q93_kmeans_ivf_lists", None)
def q93_kmeans_ivf_lists(spark, sf_dir):
    """Distributed Lloyd's k-means (3 iterations, deterministic
    lowest-id seeds) + IVF list assignment, surfaced as per-list
    population counts. No SQL oracle: the float-valued multi-iteration
    refinement isn't expressible as one ANSI query (the driver records
    a rows-only check); accuracy is pytest-verified on planted
    clusters (tests/test_similarity.py), and the update RULE itself is
    driver-checked bit-for-bit by the engine-exact single-iteration
    twin q142 (similarity.kmeans_one_iter_exact) — the k-means family
    is no longer oracle-blind."""
    e = _t(spark, sf_dir, "embeddings")
    cents = SIM.ivf_centroids_kmeans(
        e, "embedding", "vec_id", n_lists=4, n_iters=3
    )
    return (
        SIM.ivf_assign(e, cents, "embedding", "vec_id", fused=True)
        .groupBy("list_id")
        .agg(F.count(F.lit(1)).alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
    )


@register(
    "q94_corpus_curation",
    r"""
    WITH base AS (
      SELECT doc_id, COALESCE(text,'') AS s,
             list_filter(string_split_regex(COALESCE(text,''), '\s+'),
                         x -> x <> '') AS toks,
             list_filter(string_split_regex(LOWER(COALESCE(text,'')), '\s+'),
                         x -> x <> '') AS ltoks
      FROM documents
    ),
    m AS (
      SELECT doc_id, s, toks,
             LEN(toks) AS n_words,
             CASE WHEN LEN(toks) = 0 THEN 0.0
                  ELSE list_sum(list_transform(toks, x -> LENGTH(x)))::DOUBLE
                       / LEN(toks) END AS mean_len,
             CASE WHEN LEN(toks) = 0 THEN 1.0
                  ELSE LEN(regexp_extract_all(s, '#|\.\.\.'))::DOUBLE / LEN(toks)
                  END AS symbol_ratio,
             CASE WHEN LEN(toks) = 0 THEN 0.0
                  ELSE LEN(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
                       / LEN(toks) END AS alpha_ratio,
             CASE WHEN LEN(ltoks) = 0 THEN 0.0
                  ELSE LEN(list_filter(ltoks, x -> x IN
                    ('the','a','an','and','or','of','to','in','is','are','was',
                     'were','be','been','it','this','that','for','on','with',
                     'as','at','by','from')))::DOUBLE / LEN(ltoks) END AS stop_ratio,
             CASE WHEN LENGTH(s) = 0 THEN 0.0
                  ELSE (LENGTH(s) - LENGTH(regexp_replace(s, '[^\p{L}\p{N}\s]', '', 'g')))::DOUBLE
                       / LENGTH(s) END AS punct_ratio,
             list_filter(string_split(s, CHR(10)), x -> TRIM(x) <> '') AS lines
      FROM base
    ),
    q AS (
      SELECT *,
             ROUND((LEAST(n_words / 20.0, 1.0)
                    + (1.0 - LEAST(punct_ratio * 4, 1.0))
                    + LEAST(stop_ratio * 5, 1.0)) / 3, 4) AS quality,
             CASE WHEN LEN(lines) <= 1 THEN 0.0
                  ELSE ROUND(1.0 - LEN(list_distinct(lines))::DOUBLE / LEN(lines), 4)
             END AS rep_ratio
      FROM m
    ),
    filt AS (
      SELECT * FROM q
      WHERE quality >= 0.3
        AND n_words >= 50 AND n_words <= 100000
        AND mean_len >= 3.0 AND mean_len <= 10.0
        AND symbol_ratio <= 0.1 AND alpha_ratio >= 0.8
        AND rep_ratio <= 0.3
    ),
    ded AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY md5(TRIM(regexp_replace(regexp_replace(LOWER(s),
                 '[^\p{L}\p{N}\s]', '', 'g'), '\s+', ' ', 'g')))
               ORDER BY doc_id) AS rn
      FROM filt
    ),
    red AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(s,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               'https?://[^\s]+', '<URL>', 'g'),
               '\b\d{7,}\b', '<DIGITS>', 'g') AS rs
      FROM ded WHERE rn = 1
    ),
    tok AS (
      SELECT doc_id,
             LEN(list_filter(string_split_regex(rs, '\s+'), x -> x <> '')) AS n_tokens,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                       % 10000 < 1000 THEN 'test' ELSE 'train' END AS split
      FROM red
    )
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           MIN(doc_id) AS min_doc_id
    FROM tok GROUP BY split
    """,
)
def q94_corpus_curation(spark, sf_dir):
    """The full training-corpus curation chain (pipelines/corpus.py)
    as one driver-checkable query: quality/Gopher/repetition filters
    -> fingerprint dedup -> PII redaction -> token accounting ->
    hash-stable split, aggregated per split. The oracle re-derives
    every stage in SQL from the fragments already proven by
    q27/q28/q29/q58/q61/q64/q65. (The near-dedup and segment-dedup
    stages are exercised by q31-q33/q91 and the pipeline's own
    pytest — here the dedup stage is the fingerprint strategy so the
    whole chain stays ANSI-expressible.)"""
    from product_etl_spark.pipelines.corpus import CurateConfig, curate_corpus

    docs = _t(spark, sf_dir, "documents")
    cfg = CurateConfig(
        min_quality=0.3,
        gopher=True,
        max_line_repetition=0.3,
        dedup_strategy="fingerprint",
        segment_dedup_words=None,
        redact_pii=True,
        test_fraction=0.1,
    )
    train, val, _ = curate_corpus(docs, "text", "doc_id", cfg)
    u = train.withColumn("split", F.lit("train")).unionByName(
        val.withColumn("split", F.lit("test"))
    )
    return u.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        F.min("doc_id").alias("min_doc_id"),
    )


@register(
    "q95_scd2_customer_history",
    """
    WITH s1 AS (
      SELECT o_custkey AS c_custkey, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY o_custkey
    ),
    s2 AS (
      SELECT o_custkey AS c_custkey, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      FROM orders GROUP BY o_custkey
    ),
    j AS (
      SELECT s2.c_custkey, s2.n_orders AS n2, s2.spend AS sp2,
             s1.n_orders AS n1, s1.spend AS sp1
      FROM s2 LEFT JOIN s1 USING (c_custkey)
    )
    SELECT c_custkey, n1 AS n_orders, sp1 AS spend,
           DATE '2026-01-01' AS valid_from, DATE '2026-02-01' AS valid_to,
           FALSE AS is_current
    FROM j WHERE n1 IS NOT NULL AND (n1 <> n2 OR sp1 <> sp2)
    UNION ALL
    SELECT c_custkey, n1, sp1, DATE '2026-01-01', CAST(NULL AS DATE), TRUE
    FROM j WHERE n1 IS NOT NULL AND n1 = n2 AND sp1 = sp2
    UNION ALL
    SELECT c_custkey, n2, sp2, DATE '2026-02-01', CAST(NULL AS DATE), TRUE
    FROM j WHERE n1 IS NULL OR n1 <> n2 OR sp1 <> sp2
    """,
)
def q95_scd2_customer_history(spark, sf_dir):
    """SCD Type 2 (operators/scd.py) driver-checkable: snapshot 1 is
    per-customer order stats before 1998, snapshot 2 the full range;
    the merge closes changed versions at the second effective date
    and opens new ones. The oracle re-derives the version set with a
    LEFT JOIN + three-way case split — exactly the close-on-change /
    keep-unchanged / insert-new contract."""
    from product_etl_spark.operators.scd import scd2_init, scd2_merge

    o = _t(spark, sf_dir, "orders")

    def snap(df):
        return df.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("spend"),
        )

    s1 = snap(o.filter(F.col("o_orderdate") < _TS("1998-01-01 00:00:00")))
    s2 = snap(o)
    t = scd2_merge(
        scd2_init(s1, "2026-01-01"), s2, ["c_custkey"], "2026-02-01"
    )
    return t.select(
        "c_custkey",
        "n_orders",
        "spend",
        F.to_date("valid_from").alias("valid_from"),
        F.to_date("valid_to").alias("valid_to"),
        "is_current",
    )
