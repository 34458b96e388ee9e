#!/usr/bin/env python
"""Generate EXPLAIN.md: formatted physical plans + plan-health checks
for the headline queries. This is the evidence trail for the scale
review (SCALE.md) — run after any planner-relevant change.

Usage: python tools/explain_report.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = [
    "agg_pricing_summary",
    "agg_filtered_sum",
    "topk_revenue_orders",
    "join_multiway",
    "txn_settlement",
    "join_asof",
    "stream_session",
    "llm_exact_dedup",
    "llm_near_dedup",
    "llm_similarity_topk",
    "state_inventory_replay",
    "multimodal_features",
    "sort_orders",        # two-pass global rank: no single-partition stage
    "agg_salted_skew",    # two-phase salted agg == direct group-by
    "llm_curation_pipeline",  # end-to-end curation DAG
    "llm_contamination",  # df-capped gram join (r3 skew guard)
    "snk_bucketed",       # bucketed co-located join: 0 join exchanges
    "snk_partitioned",    # date-partitioned sink: pruned read
    "llm_repetition_filter",   # r4: 2-gram repetition, uniform keys
    "llm_incremental_dedup",   # r4: semi-join probes vs existing corpus
    "llm_domain_mix",          # r4: broadcast thresholds, no corpus shuffle
    "llm_context_chunks",      # r4: scan-local flatMap, zero key exchanges
    "llm_vocabulary",          # r4: 2 uniform shuffles + TakeOrdered top-k
    "llm_pseudonymize",        # r4: scan-local salted md5, AQE-owned join
    "llm_sequence_pack",       # r4: window + rollup on one shuffle
    "llm_incremental_dedup_indexed",  # r6: index-only day-2 probe
    "state_ledger_tws",        # r6: transformWithStateInPandas ledger
    "llm_ngram_jaccard",       # r7: df-capped pairwise jaccard
    "llm_incremental_index_refresh",  # r7: day-N index append + probe
    "llm_domain_mix_weighted", # r7: weighted mix, broadcast thresholds
    "sort_orders_sampled",     # r7: quantile-seeded two-pass rank
    "snk_bucketed_reuse",      # r7: cold-catalog bucketed reuse
    "llm_incremental_index_compact",  # r7: one-file-per-bucket rewrite
    "llm_pii_scrub",           # r7: scan-local regex masking, zero exchanges
    "llm_quality_stratified",  # r7: two-pass bucketed rank per source
    "llm_token_budget_sample", # r7: two-pass bucketed prefix sum per lang
    "llm_ngram_jaccard_lsh",   # r7: exact jaccard over LSH candidates
    "graph_pagerank",          # r7: fixed-point iterative graph rounds
    "snk_partitioned_compact", # r7: one-file-per-date compaction
    "cdc_apply",               # r7w5: max_by argmax with partial agg
    "agg_incremental_mv",      # r7w5: base ⊕ delta rollup merge
    "join_bloom_prune",        # r7w5: bit-test prefilter under the exchange
    "stream_interval_join",    # r7w5: bounded-range stream-stream join
    "llm_bm25_topk",           # r7w5: broadcast idf/avgdl + TakeOrdered
    "llm_weighted_sample",     # r7w5: scan-local A-ES keys + TakeOrdered
    "llm_editdist_dedup",      # r7w5: banded blocked pair join
    "agg_histogram",           # r7w6: integer binning vs broadcast range
    "snk_zorder",              # r7w6: scan-local Morton interleave
    "join_skew_salted",        # r7w6: salted fact ⋈ replicated dim
    "evt_session_paths",       # r7w6: one-shuffle gap sessionizer
    "llm_similarity_ivf_kmeans",  # r7w6: learned-cell probe + rerank
    "llm_phrase_merges",       # r7w7: scan-local pair zip + broadcast argmax
    "llm_perplexity_proxy",    # r7w10: joined unigram LM + TakeOrdered
    "llm_semantic_dedup",      # r7w11: cell-local pair join
    "snapshot_diff",           # r7w9: two pruned argmax folds + outer diff
    "dq_constraints",          # r7w8: fused constraint aggregate
    "evt_markov_transitions",  # r7w9: one lead-window pass
    "multimodal_audio_windows",  # r7w11: Arrow fan-out, no shuffle
    "llm_kmeans_refine",       # r7: array-fold assignment (no n·d·k join)
    "agg_hll_union",           # r7: mergeable sketch rollup
    "evt_rfm_segments",        # r8: bucketed-rank quartiles, no global ntile
    "llm_perplexity_bigram",   # r8: joined bigram LM, scan-local pairs
    "agg_custdist",            # r8: Q13 left-outer zero bucket
    "agg_small_qty_revenue",   # r8: decorrelated Q17 threshold
    "join_waiting_supplier",   # r8: decorrelated Q21 double existential
    "agg_large_volume_orders", # r8: Q18 agg-driven join
    "agg_dormant_customers",   # r8: Q22 broadcast scalar + anti-join
    "llm_dup_span_coverage",   # r8: tf-weighted span dup, 1:1 gram join
    "llm_bpe_encode",          # r8: staged merge application
    "llm_boilerplate_strip",   # r8: segment-df strip + reassembly
    "dq_schema_drift",         # r8: fused one-scan slice profile
    "dq_ks_drift",             # r8: bucketed-CDF KS argmax
    "dq_chi2_drift",           # r8: pooled-marginal contributions
    "llm_pq_code",             # r8: per-subspace codebooks, broadcast folds
    "llm_pq_rerank_topk",      # r8: LUT shortlist + exact rerank
    "llm_mmr_topk",            # r8: greedy rounds on pool-sized frames
    "agg_winsorized_stats",    # r8: exact rank percentiles + clip
    "llm_per_source_sample",   # r8: hash-ranked exact-k quota
    "evt_ewma_daily",          # r8: closed-form EWMA, domain-bounded join
    "llm_simhash_near_dup",    # r8: Manku pigeonhole banding
    "llm_oov_rate",            # r8: broadcast vocab membership
    "llm_zipf_fit",            # r8: five-sum closed-form regression
    "llm_per_source_sample",   # r8: hash-ranked exact-k quota
    "join_asof_tolerance",     # r8: carry + freshness predicate
    "agg_important_parts",     # r8: Q11 broadcast global scalar
    "join_top_supplier",       # r8: Q15 broadcast argmax
    "agg_large_volume_orders", # r8: Q18 agg-driven join
    "agg_dormant_customers",   # r8: Q22 anti-join
    "snk_schema_evolution",    # r8: mergeSchema append lifecycle
    "src_csv_events",          # r8: schema-on-read + corrupt channel
    "evt_ewma_chunked",        # r8: parallel linear-recurrence scan
    "llm_phrase_merges_sampled",  # r8: sampled merge statistics
    "agg_copurchase_lift",     # r8: basket-bounded pair join
    "llm_tfidf_keywords",      # r8: joined df + per-doc top-k window
    "agg_abc_classes",         # r8: integer bucketed prefix + cuts
    "evt_dau_wau",             # r8: pre-collapsed sliding distinct
    "llm_langid_confusion",    # r8: shared-predictor eval rollup
    "agg_disjunctive_revenue", # r8: Q19 derived-bound pushdown, 0 fact exchanges
    "join_min_cost_supplier",  # r8: Q2 decorrelated argmin, pinned cost frame
    "agg_supplier_part_counts",  # r8: Q16 broadcast anti + distinct agg
    "join_promotable_suppliers", # r8: Q20 one-pass dual agg + windowed threshold
    "agg_priority_late",         # r9: Q4 pushed-bound EXISTS semi
    "join_volume_shipping",      # r9: Q7 dim-membership broadcast probes
    "agg_market_share",          # r9: Q8 conditional two-measure share
    "agg_product_profit",        # r9: Q9 measure-bearing broadcast dim
    "topk_returned_customers",   # r9: Q10 agg-then-decorate top-k
    "agg_shipmode_priority",     # r9: Q12 case-sum pair
    "dq_psi_drift",              # r9: map-side binning, 10-row arithmetic
    "llm_dsir_sample",           # r9: 256-bucket broadcast importance models
    "llm_token_entropy",         # r9: scan-local entropy fold, no vocab join
    "evt_bounce_rate",           # r9: one-shuffle sessionizer + day rollup
    "evt_conversion_lag",        # r9: progressive-min decorrelation
    "evt_gini",                  # r9: bucketed prefix-sum rank, integer Gini
    "llm_nb_quality_filter",     # r9: counted NB models, broadcast scoring
    "llm_cross_source_dups",     # r9: (gram, source, n) collapse self-join
    "llm_embedding_pca",         # r9: outer-product moments, pinned mat-vec
    "dq_referential_integrity",  # r9: key-collapse + left-anti per FK edge
    "stream_interval_join_outer",  # r9: leftOuter with range in ON
    "src_jsonl_documents",       # r9: declared-schema json + corrupt channel
    "evt_purchase_cadence",      # r9: one-shuffle ordinal window + lead
    "dq_pk_uniqueness",          # r9: key-tuple groupBy per table
    "llm_pca_projection_topk",   # r9: scan-local fold vs learned direction
    "agg_revenue_concentration", # r9: fact collapse + bucketed-rank Gini
    "llm_pca_components",        # r10: deflation on the memoized moments
    "llm_pca_residual_topk",     # r10: k-direction scan-local residual fold
    "evt_ewma_long",             # r10: the chunk-and-carry branch under grade
    "llm_containment_pairs",     # r10: lang-blocked df-capped gram self-join
    "llm_cm_heavy_hitters",      # r10: 1024-cell sketch, broadcast legs
    "llm_source_kl",             # r10: (source,tok) collapse + vocab join
    "llm_centroid_drift",        # r10: scan-local explode to (label,dim) sums
    "evt_session_duration",      # r10: sessionize + bucketed per-day rank
    "evt_cohort_ltv",            # r10: (cohort,age) collapse + week² window
    "evt_new_vs_returning",      # r10: distinct user-day + first-seen map
    "dq_order_reconciliation",   # r10: per-order collapse + header left join
    "join_shipping_priority",    # r10b: Q3 — pruned scans + TakeOrdered
    "agg_local_supplier_volume", # r10b: Q5 — cyclic nation edge as join cond
    "dq_benford",                # r10b: 9-group digit agg + 1-row broadcast
    "dq_calendar_gaps",          # r10b: distinct-day collapse + gap window
    "evt_churn_risk",            # r10b: per-user MAX + watermark broadcast
    "evt_traffic_profile",       # r10b: ≤168-cell rollup, map-side partials
    "evt_power_users",           # r10b: two-pass bucketed decile rank
    "llm_minhash_calibration",   # r10b: banding candidates + exact-leg join
    "llm_ivfpq_topk",            # r10b: coarse probe + in-cell ADC + rerank
    "dq_outlier_iqr",            # r10c: bucketed-rank quartiles + fences
    "dq_null_profile",           # r10c: one scan/table, schema-bounded rows
    "evt_anomaly_seasonal",      # r10c: hourly collapse + 168-cell baseline
    "llm_ivfpq_indexed",         # r10c: partition-pruned persisted ANN probe
    "llm_ivfpq_index_append",    # r10c: O(batch) coding vs stored codebooks
    "dq_benford_decision",       # r10c: fixed-point χ² gate, 9-digit domain
    "llm_cm_sketch_persisted",   # r10c: zero-corpus-byte sketch-store probe
    "evt_survival_km",           # r10c: per-user collapse + duration domain
    "evt_survival_km_censored",  # r11: synthesized domain, gap=7 fires
    "llm_pq_rerank_topk",        # r11: sampled training + vectorized assign
    "llm_kmeans_refine",         # r11: scan-local Arrow argmin kernel
    "llm_ann_retrain_decision",  # r11: per-cell drift + load rebuild gate
    "llm_cm_sketch_windowed",    # r11: per-day cells, window = cell-wise sum
    "dq_fd_violations",          # r11: per-leg groupBy + countDistinct
    "dq_duplicate_orders",       # r11: gated (cust,day) self-join
    "agg_weighted_median",       # r11: value-level collapse + bucketed cumsum
    "llm_lsh_tuning",            # r11: S-curve sweep over capped pair space
    "graph_copurchase_components",  # r11: log-diameter min-label fixpoint
    "graph_copurchase_triangles",   # r12: degree-ordered triangle census
    "agg_ship_latency_profile",     # r12: collapsed-domain exact percentiles
    "dq_outlier_mad",               # r12: double bucketed-median MAD audit
    "llm_split_leakage",            # r12: val-in-train containment audit
    "llm_ann_recall",               # r12: IVF recall@k vs exact baseline
    "agg_hll_intersect",            # r12: sketch inclusion-exclusion
    "agg_order_backlog",            # r12: sweep-line interval count
    "evt_burst_dispersion",         # r12: hourly dispersion index
    "join_band_time_pairs",         # r12: keyless band via banded buckets
    "llm_gram_novelty",             # r12: Heaps-curve novelty collapse
    "agg_theta_intersect",          # r13: KMV theta-sketch set algebra
    "agg_trend_regression",         # r13: integer power sums + OLS
    "evt_pattern_match",            # r13: CEP regex over sessions
    "llm_rrf_fusion",               # r13: shortlist RRF fusion
    "dq_format_conformance",        # r13: fused per-table rlike audit
    "graph_copurchase_local_clustering",  # r13b: corner-exploded census
    "llm_item_cf_topk",             # r13b: CF cosine + WindowGroupLimit
    "evt_peak_concurrency",         # r13b: day-chunked sweep + carry
    "dq_freshness",                 # r13b: fused agg vs high-water mark
    "llm_source_vocab_overlap",     # r13b: distinct-collapsed token join
    "agg_kmv_quantiles",            # r13b: salted two-phase k-smallest
    "graph_link_prediction",        # r13c: capped wedge join + anti-join
    "llm_template_prefix_groups",   # r13c: scan-local prefix slice
    "win_gap_fill_locf",            # r13c: per-user IGNORE NULLS fill
    "agg_theta_intersect_persisted",  # r14: zero-corpus-scan theta probe
    "llm_minhash_calibration_persisted",  # r15: zero-corpus-scan X58 probe
]


def health(plan: str) -> list[str]:
    notes = []
    n_ex = len(re.findall(r"Exchange (?:hash|range)partitioning", plan))
    n_reused = plan.count("ReusedExchange")
    n_bc = plan.count("BroadcastHashJoin")
    n_smj = plan.count("SortMergeJoin")
    notes.append(
        f"exchanges={n_ex} (reused {n_reused}), broadcast_joins={n_bc}, "
        f"sort_merge_joins={n_smj}"
    )
    if "PushedFilters: [" in plan:
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        nonempty = [p for p in pushed if p.strip()]
        notes.append(f"scans_with_pushed_filters={len(nonempty)}")
    if "WholeStageCodegen" in plan:
        spans = set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
        notes.append(f"wholestage_codegen_spans={len(spans)}")
    if "CartesianProduct" in plan:
        notes.append("WARNING: CartesianProduct present")
    if "BroadcastNestedLoopJoin" in plan:
        # A 1-row broadcast side (in-plan scalar, e.g. the inventory
        # scale factor or a watermark horizon) is the intended pattern;
        # flag for review rather than as an error.
        notes.append(
            "note: BroadcastNestedLoopJoin present (expected when a "
            "1-row scalar aggregate is cross-joined; review if the "
            "broadcast side can exceed one row)"
        )
    return notes


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    from event_stream_checkout_spark.registry import load_all
    from event_stream_checkout_spark.session import get_session

    spark = get_session("explain-report")
    registry = load_all()
    out = [
        "# EXPLAIN — physical plans of the headline queries",
        "",
        f"Generated by `tools/explain_report.py` at `{sf_dir}`. "
        "Plan-health summary per query, then the formatted plan.",
        "",
    ]
    for key in QUERIES:
        df = registry[key].fn(spark, sf_dir)
        formatted = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        executed = df._jdf.queryExecution().executedPlan().toString()
        out.append(f"## {key}")
        out.append("")
        for note in health(executed + formatted):
            out.append(f"- {note}")
        out.append("")
        out.append("```")
        out.append(formatted.strip()[:4000])
        out.append("```")
        out.append("")
    Path("EXPLAIN.md").write_text("\n".join(out))
    print(f"wrote EXPLAIN.md ({len(QUERIES)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
