"""Catalog assembly + driver-facing ordering.

The correctness driver checks only the FIRST 50 entries of
``queries()`` (dict insertion order). Numeric registration order would
spend all 50 slots on q01–q50 and leave every family introduced later
(JSON, ranking windows, TPC-H composites, sampling, null semantics,
HAVING, NTILE, winnowing, IVF, Gopher, PII, packing…) without a driver
row. ``_DRIVER_WINDOW`` therefore pins an explicit 50-query window that
covers every SURVEY §2 operator family at least once; the remaining 76
queries stay registered (and locally oracle-checked by
tests/test_oracle_parity.py) after the window.

Demotions are only of queries whose family keeps another green driver
row, e.g. q07 min/max → q44 stats; q08/q10 distinct+top-k → q49/q02;
q42 cube → q41 rollup; q43 exact percentiles → q76 NTILE; q19 date
arithmetic → q23 epoch rollup + q46 as-of. Round-2 swaps for the new
headline capabilities: q33 jaccard-verify → q91 segment dedup (the
near-dup family keeps q31/q32), q65 repetition → q92 blocked-cosine
near-dup (repetition filtering is verified inside q94's chain and
q58 keeps the quality-filter row), q76 NTILE → q94 corpus curation
(exact percentiles stay via q43's pytest parity and the NTILE swap
is plan-asserted in tests/test_scale_ops.py).

Round-4 swaps: q34 simhash -> q112 benchmark decontamination (the
near-dup family keeps q29/q31/q32/q91/q92 driver rows; decontamination
was a family with zero driver coverage); q11 distinct projection ->
q114 transition PageRank (DISTINCT keeps q49's exact distinct-count
row; the iterative-graph family had zero driver coverage).

Round-2 session-2 swaps for the q96+ families: q15 running revenue ->
q96 gap-fill+LOCF (the running-window family keeps q24's running sum
and q96's own LOCF frame), q22 URL regex -> q97 funnel (regex
extraction keeps q21 + q64), q44 basic stats -> q102 exact-moment
stats (a strict superset: mean/variance/corr from decimal moment
sums), q53 rank-in-group -> q99 TF-IDF (which ranks per doc with
row_number and adds the relevance-ranking family).

Round-7 outcome: 50/50 green (CORRECTNESS_r07.json) — the first
fully-green window since r4; every r7-scheduled query now has a
fresh driver row.

Round-8 ROTATION (per the r7 verdict's items 1 and 4): the seven
queries registered after the r7 window froze lead (q149 FD
violations, q150 Benford, q151 event entropy, q152 Gini, q153 MAD
outliers, q154 exact-Jaccard PPJoin, q155 trigram substring search
— all exact-local green in r7 via test_driver_window_parity.py but
never driver-hashed). Next the 14 stale slots the verdict names:
q35/q36 (ceded their r7 slots) and the twelve r4-last-green reps
q54/q59/q60/q66/q70/q71/q73/q75/q91/q96/q97/q102. Then the 6
standing anchors (q01/q02/q32/q94/q112/q114). The remaining 23
slots refresh the r5-last-green tier (family reps across windows,
sampling/splits, TPC-H composites, SCD2/cohort, PQ/BM25 retrieval:
q52/q53/q55/q61/q62/q63/q65/q67/q72/q74/q76/q79/q81/q84/q87/q95/
q98/q100/q103/q113/q115/q116/q117) — new-in-r8 registrations swap
into these r5-refresh slots as they land, so after r8 no catalog
entry's newest green row is older than r5 and nothing new waits a
round. Every demoted query keeps a green row <= r7 old. Per-query
round stamps live in COVERAGE.md.
"""

from product_etl_spark.plans.catalog import CATALOG, oracle_sql, queries  # noqa: F401
from product_etl_spark.plans import catalog_ext  # noqa: F401  (registers q41+)
from product_etl_spark.plans import catalog_ext2  # noqa: F401  (registers q81+)
from product_etl_spark.plans import catalog_ext3  # noqa: F401  (registers q96+)
from product_etl_spark.plans import catalog_ext4  # noqa: F401  (registers q105+)
from product_etl_spark.plans import catalog_ext5  # noqa: F401  (registers q115+)
from product_etl_spark.plans import catalog_ext6  # noqa: F401  (registers q122+)
from product_etl_spark.plans import catalog_ext7  # noqa: F401  (registers q132+)
from product_etl_spark.plans import catalog_ext8  # noqa: F401  (registers q137+)
from product_etl_spark.plans import catalog_ext9  # noqa: F401  (registers q142+)
from product_etl_spark.plans import catalog_ext10  # noqa: F401  (registers q156+)

# Queries that are iterative / not ANSI-SQL-expressible: registered in
# queries() without an oracle_sql() entry; the driver records a weaker
# rows-only check for them (documented in __spark_entry__ contract).
_ROWS_ONLY = {"q93_kmeans_ivf_lists"}

_DRIVER_WINDOW = [
    # -- registered late in r7, never driver-checked --
    "q149_fd_violations",
    "q150_benford_first_digit",
    "q151_user_event_entropy",
    "q152_segment_balance_gini",
    "q153_mad_balance_outliers",
    "q154_exact_jaccard_join",
    "q155_trigram_substring_search",
    # -- stale refresh: the 14 slots the r7 verdict names (all r4) --
    "q35_knn_bruteforce",
    "q36_lsh_bucket_histogram",
    "q54_above_nation_average",
    "q59_master_variant_split",
    "q60_deterministic_sample",
    "q66_context_packing",
    "q70_null_safe_join",
    "q71_tpch_q6_forecast_revenue",
    "q73_tpch_q5_local_supplier_volume",
    "q75_having_filter",
    "q91_segment_dedup",
    "q96_daily_gapfill_locf",
    "q97_event_funnel",
    "q102_lineitem_moment_stats",
    # -- 6 anchors: flagship family reps, green every round --
    "q01_pricing_summary",
    "q02_top_revenue_orders",
    "q32_lsh_near_dup_pairs",
    "q94_corpus_curation",
    "q112_benchmark_decontam",
    "q114_transition_pagerank",
    # -- refresh: r5-last-green family reps (new-in-r8 entries swap
    #    into these slots as they are registered) --
    "q52_value_delta_lag",
    "q61_train_test_split",
    "q62_stratified_cap",
    "q63_source_mixing",
    "q72_tpch_q3_shipping_priority",
    "q74_tpch_q10_returned_items",
    "q79_json_schema_on_read",
    "q81_tpch_q7_volume_shipping",
    "q87_tpch_q17_small_quantity_revenue",
    "q95_scd2_customer_history",
    "q98_cohort_retention",
    "q113_bigram_lm_perplexity",
    "q115_pq_codes",
    "q116_pq_adc_topk",
    "q117_bm25_search",
    # -- new in r8 --
    "q156_dedup_cluster_components",
    "q157_salted_join_rollup",
    "q158_zorder_bucket_stats",
    "q159_containment_pairs",
    "q160_interval_overlap_join",
    "q161_brand_size_price_ols",
    "q162_last_touch_attribution",
    "q163_segment_balance_divergence",
]


def _reorder_for_driver() -> None:
    missing = [n for n in _DRIVER_WINDOW if n not in CATALOG]
    if missing:  # fail loudly at import, not silently at judge time
        raise RuntimeError(f"driver window names unknown queries: {missing}")
    rest = [n for n in CATALOG if n not in _DRIVER_WINDOW]
    ordered = {n: CATALOG[n] for n in [*_DRIVER_WINDOW, *rest]}
    CATALOG.clear()
    CATALOG.update(ordered)


_reorder_for_driver()
