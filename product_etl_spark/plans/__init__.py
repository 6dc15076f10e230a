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

Round-12 ROTATION (executes the plan above, per the r11 verdict's
items 1 and 2): the full 23-entry post-freeze queue q189-q211 leads,
then the 15-entry r8-last-green tier q149-q163, the 6 standing
anchors (q01/q02/q32/q94/q112/q114, last green r10), and the 6
oldest-r9 reps (q164-q168 + q93 rows-only). After r12 no catalog
entry's newest green row is older than r9. New-in-r12 registrations
(suffix-array dedup, PCA moment pin — r11 verdict items 4 and 5)
land in the post-freeze queue with the exact harness, per the
standing queue discipline.

Round-13 ROTATION (executes the plan written at the end of r12, per
the r12 verdict's item 1): the 5-entry post-freeze queue q212-q216
leads, joined by the two new-in-r13 registrations scheduled same
round (q217 doubling-construction twin — verdict item 3; q218
incremental suffix-span probe — item 4; the q188 pattern). The
stalest cohort per the COVERAGE.md LEDGER is the 29-entry
r8-last-green tier (q35/q36/q52/q54/q59-q63/q66/q70-q75/q79/q81/
q87/q91/q95-q98/q102/q113/q115-q117 — the r12 verdict's narrative
called this cohort r9; the ledger stamps say r8, ledger wins) — all
29 get slots. The remaining 14 take the oldest r9-last-green reps
(q13/q34/q43/q44/q46/q53/q55/q65/q67/q68/q76/q77/q78/q80). The six
standing anchors are r12-fresh and sit out. After r13 the stalest
green row is r9 (q82-q90, q100-q111, q169-q173 cohort).

Round-14 ROTATION PLAN (for the session that composes it, written at
the end of r13): post-freeze queue registrations lead, as every
round. The stalest cohort is then the 26-entry r9-last-green
remainder (q82-q86/q88-q90, q100-q111, q169-q173) — all of it —
plus q93~ (rows-only). The six standing anchors
(q01/q02/q32/q94/q112/q114, last green r12) can sit out again
unless slots are spare; fill any remaining slots with the oldest
r10 reps (q174-q176 cohort and the r10-stamped family reps per the
ledger). After r14 no entry's newest green row should be older than
r10.

Round-14 ROTATION (executes the plan above, per the r13 verdict's
item 1): the 7-entry post-freeze queue q219-q225 leads (suffix
probe excision, balanced shards + balance audit, tandem loops,
Mann-Whitney rank-sum, grouped Spearman, seasonal decomposition —
all exact-green at sf0.01 since registration via
tests/test_driver_window_parity.py, none with a driver row yet).
Then the ENTIRE r9-last-green remainder per the COVERAGE.md ledger
— 24 entries, not the plan's nominal 26, because q102 and q113-q117
refreshed in r13 and the ledger wins — plus q93~ (rows-only; the
plan schedules it with its r9 cohort). New-in-r14 registrations
join same-round per the q188 pattern. The remaining slots take the
oldest r10 reps: the q174-q176 post-r9-freeze cohort first, then
r10-stamped family reps in registration order. The six standing
anchors are r12-fresh and sit out again. After r14 no entry's
newest green row is older than r10. Five new-in-r14 registrations
(q226 incremental shard append, q227 curriculum interleave, q228
token-budget select, q229 quota backfill, q230 Kruskal-Wallis)
joined same-round per the q188 pattern, each displacing the tail
r10 fill (q25/q22/q19/q17/q15 ceded — all stay r10-green, within
the freshness bound).

Round-15 ROTATION PLAN (for the session that composes it, written at
the end of r14): post-freeze queue registrations lead, as every
round (the r14 queue is EMPTY — all five r14 registrations were
scheduled same-round). The stalest cohort per the COVERAGE.md
ledger is then the 31-entry r10-last-green tier (q15/q17/q19/q22/
q25/q28/q37/q39/q42/q48/q50, the r6-registered q118/q119/q121-q133/
q135/q136 remainder, and q177-q179) — all of it. The remaining ~19
slots take the oldest r11-last-green reps in registration order
(q12/q16/q18/q20/q21/q23/q24/q26/q27/q29/q30/q31/q33/q38/q40/q41/
q45/q47/q49). The six standing anchors (q01/q02/q32/q94/q112/q114,
last green r12) can sit out once more or take spare slots;
new-in-r15 registrations displace the r11-fill tail per the q188
pattern. After r15 no entry's newest green row should be older
than r11.

Round-15 ROTATION (executes the plan above, per the r14 verdict's
item 1): the post-freeze queue is EMPTY (all five r14 registrations
were scheduled same-round), so the 31-entry r10-last-green tier
leads (q15/q17/q19/q22/q25/q28/q37/q39/q42/q48/q50, the
r6-registered q118/q119/q121-q133/q135/q136 remainder, and
q177-q179), followed by the 19 oldest r11-last-green reps in
registration order (q12/q16/q18/q20/q21/q23/q24/q26/q27/q29/q30/
q31/q33/q38/q40/q41/q45/q47/q49). The six standing anchors
(q01/q02/q32/q94/q112/q114, last green r12) sit out once more.
New-in-r15 registrations join same-round per the q188 pattern,
each displacing the TAIL of the r11 fill (the displaced rep stays
r11-green, within the freshness bound). After r15 no entry's
newest green row is older than r11.

Round-16 ROTATION PLAN (for the session that composes it, written
at the end of r15): post-freeze queue registrations lead, as every
round (the r15 queue is EMPTY — all six r15 registrations
q231-q236 were scheduled same-round). The stalest cohort per the
COVERAGE.md ledger is then the ENTIRE 37-entry r11-last-green tier:
the six reps the r15 fill ceded to q231-q236
(q38/q40/q41/q45/q47/q49), the r11-stamped family reps
q51/q56/q57/q58/q64/q69/q92/q99/q120/q134, and the
q137-q148/q180-q188 registration tiers — all of it. The remaining
13 slots go to the oldest r12 rows: the six standing anchors FIRST
(q01/q02/q32/q94/q112/q114, last green r12 — they have sat out
three rotations and must not reach r13-stale), then the seven
oldest r12 reps in registration order (q149-q155). That fills
exactly 50. New-in-r16 registrations displace the r12-rep tail per
the q188 pattern (never the anchors). After r16 no entry's newest
green row should be older than r12.

Round-16 ROTATION (executes the plan above, per the r15 verdict's
item 9): the post-freeze queue is EMPTY (all six r15 registrations
q231-q236 were scheduled same-round), so the window is exactly the
written 50: the 37-entry r11-last-green tier
(q38/q40/q41/q45/q47/q49, q51/q56/q57/q58/q64/q69/q92/q99/q120/
q134, q137-q148, q180-q188), the six standing anchors
(q01/q02/q32/q94/q112/q114), and the seven oldest r12 reps
(q149-q155). After r16 no entry's newest green row is older
than r12.

Round-17 ROTATION PLAN (for the session that composes it, written
at the end of r16): post-freeze queue registrations lead, as every
round (the r16 optimization round registers nothing, so the queue
is expected EMPTY). The stalest cohort per the COVERAGE.md ledger
is then the ENTIRE 36-entry r12-last-green tier: the q156-q168
registration tier and the q189-q211 tier. The remaining 14 slots
take the oldest r13 rows in registration order
(q13/q34/q35/q36/q43/q44/q46/q52/q53/q54/q55/q59/q60/q61).
That fills exactly 50. New-in-r17 registrations displace the
r13-rep tail per the q188 pattern. After r17 no entry's newest
green row should be older than r13.
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
from product_etl_spark.plans import catalog_ext14  # noqa: F401  (registers q212+)
from product_etl_spark.plans import catalog_ext15  # noqa: F401  (registers q217+)
from product_etl_spark.plans import catalog_ext16  # noqa: F401  (registers q226+)
from product_etl_spark.plans import catalog_ext17  # noqa: F401  (registers q233+)

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
    # empty at r14 rotation time: the full r13 queue (q219-q225)
    # graduated into the r14 window below. New-in-r14 registrations
    # land here (or swap into the window's r10-fill tail if they
    # register before the r14 freeze, per the q188 pattern) so
    # tests/test_driver_window_parity.py exact-checks them from
    # registration day.
]

_DRIVER_WINDOW = [
    # -- r16 rotation (r15 verdict item 9; the post-freeze queue is
    #    EMPTY this round). The ENTIRE 37-entry r11-last-green tier
    #    leads: the six reps the r15 fill ceded to q231-q236, the
    #    r11-stamped family reps, then the q137-q148 and q180-q188
    #    registration tiers --
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
    "q180_hard_negative_pairs",
    "q181_sorted_neighborhood_pairs",
    "q182_k_anonymity_suppression",
    "q183_kfold_assignment",
    "q184_woe_price_bins",
    "q185_user_burstiness",
    "q186_next_event_pairs",
    "q187_dedup_cluster_histogram",
    "q188_unigram_min_pieces",
    # -- the six standing anchors, last green r12: they have sat out
    #    three rotations and must not reach r13-stale --
    "q01_pricing_summary",
    "q02_top_revenue_orders",
    "q32_lsh_near_dup_pairs",
    "q94_corpus_curation",
    "q112_benchmark_decontam",
    "q114_transition_pagerank",
    # -- the seven oldest r12 reps in registration order --
    "q149_fd_violations",
    "q150_benford_first_digit",
    "q151_user_event_entropy",
    "q152_segment_balance_gini",
    "q153_mad_balance_outliers",
    "q154_exact_jaccard_join",
    "q155_trigram_substring_search",
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
