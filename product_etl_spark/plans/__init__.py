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

Round-10 ROTATION (per the r9 verdict's items 2 and 5): the three
entries registered after the r9 freeze lead (q174 grouped mode,
q175 revenue concentration, q176 winsorized mean — completing the
robust-statistics lattice), then ALL 35 r6-last-green entries
(verdict item 5's cohort: q03/q04/q07/q08/q10/q11/q14/q15/q17/q19/
q22/q25/q28/q37/q39/q42/q48/q50 + the r6-registered q118-q136 tier
minus the r7-refreshed q120/q134), the 6 anchors, and the new-in-
r10 registrations / oldest-r7 reps in the tail slots. After r10 no
catalog entry's newest green row is older than r7.

Round-11 ROTATION (per the r10 verdict's items 1 and 2): the eight
entries registered after the r10 freeze lead (q180 hard-negative
mining, q181 SNM blocking, q182 k-anonymity suppression, q183
k-fold, q184 WOE bins, q185 burstiness, q186 next-event pairs,
q187 cluster histogram), then the new-in-r11 tokenizer row (q188
unigram min-pieces), then ALL 41 r7-last-green entries (verdict
item 2's cohort). That fills exactly 50 slots; the 6 anchors sit
out one round (last green r10, within the freshness bound) and
q189 SemDeDup waits in the queue with the exact harness. After r11
no catalog entry's newest green row is older than r8.

Round-12 ROTATION PLAN (for the session that composes it, written at
the end of r11): the queue below holds 23 post-freeze registrations
(q189-q211) — they lead, as every round. The stalest cohorts are
then the r8-last-green tier (q149-q163, 15 entries) and the six
standing anchors (q01/q02/q32/q94/q112/q114, last green r10). That
is 23 + 15 + 6 = 44 slots; the remaining 6 take the oldest r9
reps (q164-q168 + q93~). Catalog growth deliberately stopped at 211
this round so the r12 window can clear the whole queue without
crowding out the freshness bound.
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
from product_etl_spark.plans import catalog_ext12  # noqa: F401  (registers q177+)
from product_etl_spark.plans import catalog_ext13  # noqa: F401  (registers q188+)

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
_NEXT_WINDOW_QUEUE: list[str] = [
    "q189_semdedup_prune",
    "q190_wordpiece_first_merge",
    "q191_domain_mixture_budgets",
    "q192_event_key_skew_profile",
    "q193_cluster_safe_folds",
    "q194_ann_recall_audit",
    "q195_kneser_ney_bigrams",
    "q196_fold_contamination_audit",
    "q197_linkage_agreement_patterns",
    "q198_t_closeness_audit",
    "q199_zipf_fit",
    "q200_heaps_fit",
    "q201_minhash_recall_audit",
    "q202_ivf_recall_audit",
    "q203_association_rules",
    "q204_rfm_segments",
    "q205_cusum_changepoint",
    "q206_crossfold_kn_scores",
    "q207_kaplan_meier_churn",
    "q208_unseen_vocabulary",
    "q209_mad_anomaly_days",
    "q210_weekday_uniformity",
    "q211_seasonal_naive_backtest",
]

_DRIVER_WINDOW = [
    # -- registered after the r10 freeze, exact-checked every pytest
    #    run since registration (r10 verdict item 1) --
    "q180_hard_negative_pairs",
    "q181_sorted_neighborhood_pairs",
    "q182_k_anonymity_suppression",
    "q183_kfold_assignment",
    "q184_woe_price_bins",
    "q185_user_burstiness",
    "q186_next_event_pairs",
    "q187_dedup_cluster_histogram",
    # -- new-in-r11 registration (tokenizer-family driver row) --
    "q188_unigram_min_pieces",
    # -- stale refresh: EVERY r7-last-green entry (r10 verdict
    #    item 2's cohort) — after r11 no catalog entry's newest green
    #    row is older than r8 --
    "q12_active_nations_union",
    "q16_like_filter",
    "q18_price_buckets",
    "q20_string_projection",
    "q21_attribute_parse_explode",
    "q23_hourly_event_rollup",
    "q24_sessionization",
    "q26_user_event_timeline",
    "q27_doc_token_stats",
    "q29_doc_fingerprint_dedup",
    "q30_doc_script_langid",
    "q31_minhash_signatures",
    "q33_ngram_jaccard_pairs",
    "q38_referential_integrity",
    "q40_brand_dictionary",
    "q41_rollup_region_nation",
    "q45_price_band_range_join",
    "q47_event_pivot",
    "q49_distinct_users_by_type",
    "q51_props_json_extract",
    "q56_ivf_assignment",
    "q57_winnowing_fingerprints",
    "q58_gopher_quality_filters",
    "q64_pii_redaction",
    "q69_null_aware_not_in",
    "q92_cosine_near_dup_pairs",
    "q99_tfidf_top_terms",
    "q120_binary_hash_hamming",
    "q134_changelog_snapshot",
    "q137_entity_resolution_pairs",
    "q138_dsir_importance",
    "q139_price_psi_drift",
    "q140_k_anonymity_audit",
    "q141_copurchase_triangles",
    "q142_kmeans_one_iter_lists",
    "q143_order_partition_checksums",
    "q144_dup_ngram_fraction",
    "q145_flesch_readability",
    "q146_part_price_size_skyline",
    "q147_crossdoc_dup_span_coverage",
    "q148_price_ks_drift",
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
