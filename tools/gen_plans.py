#!/usr/bin/env python3
"""Generate PLANS.md: executed physical plans for headline queries.

Run: python tools/gen_plans.py  (writes PLANS.md at repo root)

The committed output is the plan-review artifact: pushed filters,
pruned schemas, broadcast choices, partial aggregation, and codegen
spans for the queries whose shape matters most at 100 TB.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from contextlib import redirect_stdout

from product_etl_spark.plans import CATALOG
from product_etl_spark.session import get_spark

HEADLINERS = [
    ("q01_pricing_summary", "pushed filter + pruned scan + 2-phase agg"),
    ("q02_top_revenue_orders", "aggregate-below-join + broadcast dims + TakeOrdered"),
    ("q03_region_nation_rollup", "broadcast dimension chain"),
    ("q04_customers_without_orders", "anti-join (incremental pattern)"),
    ("q14_first_order_per_customer", "first-row-per-group window"),
    ("q24_sessionization", "gaps-and-islands double window, one shuffle"),
    ("q31_minhash_signatures", "row-wise shingles + partial MIN aggs"),
    ("q32_lsh_near_dup_pairs", "band self-join on uniform keys"),
    ("q35_knn_bruteforce", "broadcast queries, corpus never shuffles"),
    ("q45_price_band_range_join", "broadcast nested loop theta join"),
    ("q56_ivf_assignment", "TakeOrderedAndProject centroid seed + broadcast assign"),
    ("q66_context_packing", "two-phase bucketed cumsum, no corpus-wide window"),
    ("q73_tpch_q5_local_supplier_volume", "6-way join, dims broadcast, agg on top"),
    ("q74_tpch_q10_returned_items", "aggregate-below-join: per-order revenue pre-summed before customer joins"),
    ("q86_tpch_q15_top_supplier", "max-pick as broadcast join, no global sort/window"),
    ("q88_tpch_q18_large_volume_customers", "HAVING semi-join + TakeOrderedAndProject"),
    ("q91_segment_dedup", "min-struct first-occurrence, map-side combine on the hot key"),
    ("q92_cosine_near_dup_pairs", "self-join keyed on the blocking column, no cartesian"),
    ("q94_corpus_curation", "full curation chain: map-only filters ahead of the dedup shuffle"),
    ("q95_scd2_customer_history", "SCD2 merge: history passthrough + one business-key equi-join"),
    ("q96_daily_gapfill_locf", "executor-side day grid + key-partitioned LOCF window"),
    ("q99_tfidf_top_terms", "tf/df count join on term, per-doc integer-keyed rank, scalar broadcast"),
    ("q101_weighted_doc_sample", "weighted membership as pure scan+filter (totals inlined as literals)"),
    ("q105_tpch_q2_min_cost_supplier", "groupwise-min join-back; part filter below the partial agg; TakeOrdered"),
    ("q106_tpch_q4_order_priority", "correlated EXISTS as LeftSemi with inequality residual"),
    ("q111_tpch_q21_waiting_suppliers", "one per-order aggregate replaces the classic double lineitem self-join"),
    ("q112_benchmark_decontam", "one corpus pass; benchmark grams broadcast as a hit-mark"),
    ("q113_bigram_lm_perplexity", "vocab-bounded LM count tables; corpus scored via bigram-keyed joins"),
    ("q114_transition_pagerank", "power iteration: two node-keyed shuffles per round, lineage checkpointed"),
    ("q115_pq_codes", "PQ encode as a pure map: literal-codebook argmins, zero Exchange"),
    ("q116_pq_adc_topk", "ADC over 4-byte codes: broadcast queries + bounded single-window top-k (WindowGroupLimit)"),
    ("q121_hybrid_rrf_search", "two bounded retrieval legs (decimal BM25 + decimal L2) fused on integer ranks"),
    ("q122_quality_canonical_dedup", "canonical selection as one min-struct agg: no window, one exchange"),
    ("q123_fuzzy_decontam", "train bands x BROADCAST benchmark bands; corpus never self-joins"),
    ("q124_grouping_sets", "irregular grouping sets: one Expand + one shuffle, not three scans"),
    ("q127_trained_langid_confusion", "profiles broadcast; corpus tokenized map-side, (doc,lang) agg combines"),
    ("q133_bigram_pmi", "vocab-bounded count shuffles; min-count floor BEFORE the joins; totals broadcast"),
    ("q134_changelog_snapshot", "CDC apply as ONE max-struct agg: single exchange, partial map-side, no window"),
    ("q137_entity_resolution_pairs", "blocked linkage: equi-join on the block key, levenshtein as residual, no cartesian"),
    ("q138_dsir_importance", "n_buckets-bounded feature tables; log-ratio table broadcast into the doc-side join"),
    ("q139_price_psi_drift", "1-row baseline min/max broadcast; one map-side-combined groupBy(bin) per snapshot"),
    ("q141_copurchase_triangles", "degree-ordered wedges: node-keyed equi-joins only, fan-out bounded by out-degree"),
    ("q142_kmeans_one_iter_lists", "exact Lloyd step: k-row centroid broadcasts, (list,pos)-bounded mean update, corpus never self-joins"),
    ("q143_order_partition_checksums", "integrity checksums: ONE groupBy, count/xor/min/max all combine map-side"),
    ("q144_dup_ngram_fraction", "repetition metric row-wise: explode + LEAD shingles, doc-keyed count, TakeOrdered top-k"),
    ("q147_crossdoc_dup_span_coverage", "dup spans: vocab-shaped gram count, join-back, islands window over duplicated positions only"),
    ("q154_exact_jaccard_join", "exact Jaccard join: candidates keyed on rare-first PREFIX tokens, array_intersect verify, no all-pairs"),
    ("q146_part_price_size_skyline", "skyline r8: groupBy(x).max(y) pre-agg, global window sees one row per distinct x"),
    ("q157_salted_join_rollup", "salted join: (key, salt) shuffle keys, dim exploded 8x, hot keys spread over 8 tasks"),
    ("q158_zorder_bucket_stats", "Morton key: unrolled shift/and/or inside one codegen span, single map-side-combined groupBy"),
    ("q159_containment_pairs", "containment join: ONE-SIDED prefix candidates, array_intersect verify on candidate pairs only"),
    ("q160_interval_overlap_join", "interval overlap: grid cells give the range predicate a uniform equi-key, exact verify + distinct"),
    ("q162_last_touch_attribution", "as-of attribution: union both sides, ONE user-keyed window, no range join"),
    ("q163_segment_balance_divergence", "segment divergence: broadcast 1-row frame, groupBy(bin) + groupBy(seg,bin), totals broadcast onto the grid"),
    ("q165_cms_event_type_freq", "CMS: (row,bucket)-keyed build agg, broadcast sketch probe, min-over-rows estimate"),
    ("q169_quantile_sample_sketch", "portable quantile sample: per-group hash-rank top-k (WindowGroupLimit), exact rank over k rows"),
    ("q171_weighted_median_price", "weighted median: (group,value) pre-agg collapses ties BEFORE the cumulative window"),
    ("q172_vocabulary_coverage", "vocab coverage: corpus-bounded term count shuffle; global window over VOCAB rows only"),
    ("q173_trimmed_mean_price", "trimmed mean: group-partitioned rank window + map-side-combined decimal agg"),
    ("q177_duplicate_span_excision", "span excision: vocab-shaped gram count, n-bounded explode, (id,pos) anti-join, doc-sized rebuild"),
    ("q180_hard_negative_pairs", "hard negatives: band-collision candidates only, exact verify candidate-bounded, per-anchor window"),
]


def generate(spark, sf_dir: str) -> str:
    """Render the PLANS.md text for HEADLINERS — shared by the CLI
    below and tests/test_plans_drift.py (which regenerates and diffs
    against the committed file so plans can't silently drift)."""
    out = [
        "# PLANS — executed physical plans of headline queries",
        "",
        f"Generated by `tools/gen_plans.py` at `{sf_dir}` (AQE final plans).",
        "What to look for: `PushedFilters` at every scan, `ReadSchema` pruned",
        "to used columns, `BroadcastHashJoin` on dimension joins, paired",
        "`partial_*`/final aggregates around each Exchange, `*(n)` whole-stage",
        "codegen spans.",
        "",
    ]
    for name, why in HEADLINERS:
        df = CATALOG[name]["fn"](spark, sf_dir)
        df.collect()  # finalize the adaptive plan
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # keep the operator tree + scan details; drop the long per-node
        # attribute dumps to stay reviewable
        head, _, tail = plan.partition("\n\n")
        scans = "\n".join(
            line
            for line in tail.splitlines()
            if line.startswith(("PushedFilters", "ReadSchema", "(", "Location"))
            and not line.startswith("Location")
        )
        out += [f"## {name} — {why}", "", "```", head.strip(), "", scans, "```", ""]
    return "\n".join(out)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("gen-plans", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    text = generate(spark, sf_dir)
    spark.stop()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.environ.get(
        "SPARK_GRAFT_PLANS_OUT", os.path.join(root, "PLANS.md")
    )
    with open(out_path, "w") as fh:
        fh.write(text)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
