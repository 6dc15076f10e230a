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

Round-9 ROTATION (per the r8 verdict's items 1, 4 and 5): the five
entries registered after the r8 freeze lead (q164 incremental
component merge, q165/q167/q168 portable CMS/HLL/KMV, q166 weighted
Jaccard), then the five new-in-r9 entries (q169 portable quantile
sample sketch — the KLL pin the verdict asked for, q170 star-
contraction components, q171 weighted median, q172 vocabulary
coverage, q173 trimmed mean). Next ALL 27 r5-last-green entries
(verdict item 4's list, incl. q93 rows-only), the 6 anchors, and 7
r6 refreshes — past-failure entries first (q68/q105/q44/q46 each
carry a rN! stamp), then q43/q34/q13 family reps. After r9 no
catalog entry's newest green row is older than r6.
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
from product_etl_spark.plans import catalog_ext11  # noqa: F401  (registers q169+)

# Queries that are iterative / not ANSI-SQL-expressible: registered in
# queries() without an oracle_sql() entry; the driver records a weaker
# rows-only check for them (documented in __spark_entry__ contract).
_ROWS_ONLY = {"q93_kmeans_ivf_lists"}

# Entries registered AFTER this round's window froze: they lead the
# next round's window. Listed here so tests/test_driver_window_parity
# runs the EXACT driver-faithful compare on them every pytest run —
# q166 carried a HUGEINT-surface oracle bug for a full round because
# nothing exact-checked it until it entered a window; queue entries
# now get the same harness as window entries from the day they are
# registered.
_NEXT_WINDOW_QUEUE = [
    "q174_brand_mode_type",
    "q175_customer_revenue_concentration",
    "q176_winsorized_mean_price",
]

_DRIVER_WINDOW = [
    # -- registered late in r8, never driver-checked (r8 verdict item 1) --
    "q164_incremental_component_merge",
    "q165_cms_event_type_freq",
    "q166_weighted_jaccard_pairs",
    "q167_hll_portable_distinct",
    "q168_kmv_event_type_overlap",
    # -- new in r9 --
    "q169_quantile_sample_sketch",
    "q170_star_components",
    "q171_weighted_median_price",
    "q172_vocabulary_coverage",
    "q173_trimmed_mean_price",
    # -- stale refresh: every r5-last-green entry (r8 verdict item 4) --
    "q53_order_rank_in_customer",
    "q55_events_per_day_of_week",
    "q65_line_repetition",
    "q67_nations_intersect",
    "q76_ntile_quartiles",
    "q77_vocabulary_topk",
    "q78_array_higher_order",
    "q80_running_distinct_types",
    "q82_tpch_q8_market_share",
    "q83_tpch_q9_product_profit",
    "q84_tpch_q13_order_count_distribution",
    "q85_tpch_q14_promo_revenue",
    "q86_tpch_q15_top_supplier",
    "q88_tpch_q18_large_volume_customers",
    "q89_tpch_q19_bracketed_revenue",
    "q90_tpch_q22_idle_balances",
    "q93_kmeans_ivf_lists",
    "q100_trailing_7d_spend",
    "q101_weighted_doc_sample",
    "q103_event_transitions",
    "q104_event_type_overlap",
    "q106_tpch_q4_order_priority",
    "q107_tpch_q11_value_concentration",
    "q108_tpch_q12_late_shipment_priority",
    "q109_tpch_q16_supplier_count",
    "q110_tpch_q20_potential_promotion",
    "q111_tpch_q21_waiting_suppliers",
    # -- 6 anchors: flagship family reps, green every round --
    "q01_pricing_summary",
    "q02_top_revenue_orders",
    "q32_lsh_near_dup_pairs",
    "q94_corpus_curation",
    "q112_benchmark_decontam",
    "q114_transition_pagerank",
    # -- r6 refresh: past-failure entries first (q68/q105/q44/q46 all
    #    carry a rN! stamp), then family reps pairing with new r9 work
    #    (q43 percentiles next to q169's sketch; q34 simhash; q13 set
    #    difference) --
    "q68_user_event_type_sets",
    "q105_tpch_q2_min_cost_supplier",
    "q44_acctbal_stats",
    "q46_asof_purchase_signup",
    "q43_price_percentiles",
    "q34_simhash",
    "q13_customer_only_nations",
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
