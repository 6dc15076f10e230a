"""Market-basket association-rule mining: support / confidence /
lift over (basket, item) rows — the Agrawal-Srikant Apriori output
surface for pair rules, computed as one blocked self-join instead of
candidate generation (pair support IS the A-priori L2 step; larger
itemsets grow from it the same way).

The reference pipeline moves order/product rows but computes no
co-occurrence analytics at all; the collocation twin for text is
operators/collocations.bigram_pmi (PMI = log lift), and the graph
view of the same pair frame feeds q141's triangle count.

Scale shape (why this survives 100 TB):
- The pair join is keyed on the BASKET id, so cost is
  O(sum basket_size^2) — bounded by real-world basket sizes, never
  item-vocabulary^2. A pathological mega-basket is the same skew
  problem as a hot LSH bucket: cap or salt it upstream
  (operators/skew.py), exactly as the dedup family does.
- Item and pair counts are map-side-combined groupBys bounded by
  item vocabulary / observed-pair vocabulary.
- The basket total folds from the basket frame as a broadcast 1-row
  aggregate; the report is top-N (TakeOrderedAndProject).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    top_n: int = 20,
    max_basket_size: int = 10_000,
) -> DataFrame:
    """Top pair rules (a -> b, a < b) by co-occurrence count:
    (item_a, item_b, n_ab, n_a, n_b, support, confidence_a_to_b,
    lift).

    support    = n_ab / N            (N = distinct baskets)
    confidence_a_to_b = n_ab / n_a   (direction a -> b; lift and
                                      support are symmetric, this
                                      column is NOT — a < b by item
                                      key order picks the direction)
    lift       = (n_ab * N) / (n_a * n_b)

    Degenerate-input guard: the pair self-join is O(sum basket^2), so
    a single crawler-artifact mega-basket (one basket holding a large
    fraction of the item vocabulary) turns a bounded join into a
    quadratic blow-up on one key. Any basket with more than
    ``max_basket_size`` distinct items therefore FAILS the job loudly
    (assert_true on the collected basket array's size, same pattern
    as interval_overlap_pairs) — cap or pre-filter the basket
    deliberately, don't discover it as an executor OOM. Real order
    baskets are dozens of items; the default bound never fires on
    sane data. Guard boundary note (r15 ADVICE, accepted drift): the
    size counts DISTINCT NON-NULL items (collect_set drops NULLs),
    so a basket of exactly max_basket_size real items plus NULL
    items no longer trips it — NULL items never formed pairs, so
    the quadratic exposure the guard bounds is unchanged.

    Float policy: all counts are exact BIGINTs; the three ratios are
    single-op trees on exact-integer doubles (the numerator/
    denominator products evaluate first, one multiply each), so any
    engine reproduces them bit-for-bit; ROUND(.,6) at the surface.
    Ordering is integer-decided (n_ab desc, item_a, item_b).
    """
    # ONE full-data exchange (r15, guide §2.3/§2.4): collect each
    # basket's distinct items as a sorted array directly — collect_set
    # dedups map-side inside the partial aggregate, so the old
    # distinct + per-basket window + self-join chain (three shuffles
    # of the item rows plus a sort-merge) collapses into one groupBy.
    # Pairs then EXPLODE from the sorted array (a < b positionally),
    # sized O(basket^2) exactly like the join output, and the size
    # guard is a plain expression on the array — no window.
    arr = (
        baskets.select(
            F.col(basket_col).alias("_bk"), F.col(item_col).alias("_it")
        )
        .groupBy("_bk")
        .agg(F.sort_array(F.collect_set("_it")).alias("_arr"))
    )
    guard = F.assert_true(
        F.size("_arr") <= F.lit(max_basket_size),
        F.concat(
            F.lit("association_rules: basket holds > "
                  f"{max_basket_size} distinct items (basket="),
            F.col("_bk").cast("string"),
            F.lit("); the pair explode is O(basket^2) — cap or "
                  "pre-filter mega-baskets, or raise max_basket_size"),
        ),
    )
    # assert_true returns NULL on success; folding it into the array
    # column keeps it in the evaluated plan (a free-standing guard
    # column would be pruned as unused and never run). Materialize
    # ONCE: the frame feeds the basket count, the item counts and the
    # pair explode.
    arr = arr.withColumn(
        "_arr", F.when(guard.isNull(), F.col("_arr"))
    ).localCheckpoint(eager=True)
    # NULL-basket semantics of the old shape, preserved exactly: a
    # NULL basket id never joined to itself (NULL != NULL), so it
    # produced no pairs and was excluded from the distinct-basket
    # count — but its items DID count into n_a/n_b.
    n_baskets = arr.filter(F.col("_bk").isNotNull()).agg(
        F.count(F.lit(1)).alias("_n")
    )
    items = (
        arr.select(F.explode("_arr").alias("_it"))
        .groupBy("_it")
        .agg(F.count(F.lit(1)).alias("_ni"))
    )
    # a<b pairs via posexplode-then-slice (r16, ADVICE r15): explode
    # the anchor index FIRST and emit only the O(basket) successor
    # slice per row — the single-expression flatten(transform(...))
    # form built the whole O(basket^2) pair array in ONE row before
    # its explode, so a guard-passing basket near max_basket_size
    # concentrated gigabytes on one executor (the OOM shape the
    # fail-loudly guard exists to prevent). Same pairs, same counts;
    # per-row memory is now O(basket).
    pairs = (
        arr.filter(F.col("_bk").isNotNull())
        .select(F.posexplode("_arr").alias("_i", "item_a"), F.col("_arr"))
        .select(
            "item_a",
            F.explode(
                F.expr("slice(_arr, _i + 2, size(_arr))")
            ).alias("item_b"),
        )
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_count)
    )
    ia = items.select(F.col("_it").alias("item_a"), F.col("_ni").alias("n_a"))
    ib = items.select(F.col("_it").alias("item_b"), F.col("_ni").alias("n_b"))
    nd = F.col("_n").cast("double")
    out = (
        pairs.join(ia, "item_a")
        .join(ib, "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(F.col("n_ab").cast("double") / nd, 6).alias("support"),
            F.round(
                F.col("n_ab").cast("double") / F.col("n_a").cast("double"),
                6,
            ).alias("confidence_a_to_b"),
            F.round(
                (F.col("n_ab").cast("double") * nd)
                / (
                    F.col("n_a").cast("double")
                    * F.col("n_b").cast("double")
                ),
                6,
            ).alias("lift"),
        )
    )
    return out.orderBy(
        F.col("n_ab").desc(), F.col("item_a").asc(), F.col("item_b").asc()
    ).limit(top_n)
