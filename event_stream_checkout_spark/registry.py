"""Query registry: the single source of truth for the engine's surface.

Each operator from SURVEY.md §2 registers here as a named query — a
callable ``(spark, sf_dir) -> DataFrame`` — optionally paired with the
equivalent ANSI SQL that DuckDB can run on the same parquet tables (the
driver's correctness oracle).  ``__spark_entry__.py`` is a thin adapter
over this registry.

Oracle-parity rules (learned the hard way, enforced by tests):
- Alias every computed column identically on both sides.
- Cast DuckDB integer aggregates to BIGINT (DuckDB sums to HUGEINT).
- Round floating aggregates on BOTH sides (summation order differs
  between engines; raw double reductions are not bit-stable).
- Give every LIMIT/top-k query a total deterministic ORDER BY
  (unique-key tiebreaker), or ties make the result set ambiguous.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    key: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    doc: str = ""


QUERIES: dict[str, Query] = {}


def register(key: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the registry."""

    def wrap(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = Query(key=key, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


# Keys that already earned a green driver CORRECTNESS row in a previous
# round (r01: 49 hash-green + agg_approx_distinct rows-only-by-design;
# r02: 50 hash-green).  The driver grades the FIRST 50 keys in
# registration order, so ``load_all`` surfaces ungraded keys first;
# previously verified keys keep full coverage via the local parity
# harness (tests/test_parity.py), which mirrors the driver gate over
# all keys.
DRIVER_VERIFIED: frozenset[str] = frozenset({
    # round 1 (CORRECTNESS_r01.json)
    "txn_settlement", "join_items_inventory", "agg_order_sufficiency",
    "agg_inventory_decrement", "agg_first_writer_wins", "filter_valid_orders",
    "filter_invalid_orders", "join_created_processed", "snk_orders_upsert",
    "snk_dlq", "scan_inventory", "state_inventory_replay", "ddl_bootstrap",
    "llm_exact_dedup", "llm_token_stats", "llm_lang_profile",
    "llm_similarity_topk", "llm_minhash_signatures", "llm_near_dedup",
    "llm_simhash", "llm_ngram_jaccard", "llm_quality_score", "llm_lang_id",
    "llm_fingerprint", "llm_similarity_ivf", "llm_embedding_stats",
    "llm_embedding_near_dup", "llm_token_regex", "llm_near_dedup_groups",
    "multimodal_features", "multimodal_dedup", "llm_median_tokens",
    "scan_lineitem", "scan_orders", "src_json_events", "filter_processed",
    "project_notification", "filter_point_lookup", "join_orders_customer",
    "join_multiway", "join_semi", "join_anti_dedup", "join_range",
    "join_asof", "agg_pricing_summary", "agg_filtered_sum", "agg_distinct",
    "agg_approx_distinct", "agg_rollup", "agg_cube",
    # round 2 (CORRECTNESS_r02.json)
    "llm_dedup_keep_best", "llm_sample_hash", "llm_contamination",
    "agg_pivot", "agg_stats", "sort_orders", "topk_orders",
    "topk_revenue_orders", "setop_union", "setop_intersect", "setop_except",
    "scan_documents", "join_left_outer", "join_full_outer",
    "agg_grouping_sets", "agg_having", "setop_union_all", "fn_conditional",
    "snk_order_created", "snk_order_processed", "agg_percentiles",
    "agg_min_max_by", "agg_corr", "win_distribution", "fn_bitwise",
    "agg_correlated_subquery", "agg_salted_skew", "agg_promo_ratio",
    "agg_mode_per_group", "setop_except_all", "fn_json_parse", "fn_map",
    "fn_json_serialize", "fn_md5", "fn_uuid_format", "fn_timestamps",
    "fn_string", "fn_date", "fn_math", "fn_array", "fn_latency",
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_watermark", "stream_dedup", "win_rank", "win_lag_lead",
    "win_running_sum", "win_topk_per_group",
    # round 3 (CORRECTNESS_r03.json) — first-time greens; the r3
    # ROUND_MODIFIED re-grades were already members.
    "llm_curation_pipeline", "multimodal_frame_sample", "snk_bucketed",
    "snk_partitioned", "state_ledger_stream",
    # round 4/5 (CORRECTNESS_r04/r05.json) — wave-3 ingest ops and the
    # approx-percentile verdict, each green in both rounds.
    "llm_repetition_filter", "llm_incremental_dedup", "llm_domain_mix",
    "llm_context_chunks", "llm_sequence_pack", "llm_vocabulary",
    "llm_pseudonymize", "agg_approx_percentile",
    # round 6 (CORRECTNESS_r06.json) — first-time greens.
    "llm_incremental_dedup_indexed", "state_ledger_tws",
    # round 7 (CORRECTNESS_r07.json) — the 44 first-time greens of
    # the r7 window (re-grades were already members).  Added in r8
    # so they do not crowd the r8 window ahead of this round's new
    # keys (load_all buckets non-members as never-graded).
    "agg_freq_items", "agg_histogram", "agg_hll_union", "agg_incremental_mv",
    "cdc_apply", "dq_constraints", "evt_activity_streaks", "evt_anomaly",
    "evt_attribution", "evt_funnel", "evt_markov_transitions", "evt_retention",
    "evt_rfm_segments", "evt_session_paths", "fn_unpivot", "graph_pagerank",
    "join_bloom_prune", "join_skew_salted", "llm_bm25_topk", "llm_dataset_split",
    "llm_domain_mix_weighted", "llm_editdist_dedup", "llm_embedding_quantize",
    "llm_incremental_index_compact", "llm_incremental_index_refresh",
    "llm_kmeans_refine", "llm_ngram_jaccard_lsh", "llm_perplexity_proxy",
    "llm_phrase_merges", "llm_pii_scrub", "llm_quality_stratified", "llm_semantic_dedup",
    "llm_similarity_ivf_kmeans", "llm_token_budget_sample", "llm_weighted_sample",
    "multimodal_audio_windows", "snapshot_diff", "snk_bucketed_reuse",
    "snk_orders_scd2", "snk_partitioned_compact", "snk_zorder", "sort_orders_sampled",
    "stream_interval_join", "win_rolling_time",
})


# Keys graded in a prior round whose ENGINE or ORACLE implementation
# changed THIS round: a stale green row must not shield a rewrite from
# re-grading (advisor finding, ADVICE.md r2), so these re-enter the
# driver window right after the never-graded keys.  Reset each round.
# ORDERED (tuple, not set): the 50-key window may not fit every
# candidate, so BEHAVIORAL rewrites lead and provably-pristine-no-op
# hardening (the r8 NULL-injection fixes, identical output on any
# NULL-free corpus — pinned by tests/test_null_parity.py) trails; a
# trailing key missing the window is covered by the local null-sweep
# parity plus the unchanged pristine contract.
ROUND_MODIFIED: tuple[str, ...] = (
    # r8: engine and/or oracle changed on previously green keys — a
    # stale green row must not shield them from re-grading.
    "evt_rfm_segments",   # global ntile replaced by two-pass bucketed
                          # rank + closed-form tile (r7 verdict item 1)
    "evt_anomaly",        # sigma>0 guard added to engine AND oracle
                          # (ADVICE.md r7 constant-series parity break)
    "llm_phrase_merges",  # rounds parquet-staged instead of
                          # localCheckpoint-pinned (r7 verdict item 3)
    "join_bloom_prune",   # bitmap sized from build-side cardinality
                          # (ADVICE.md r7 saturation finding)
    "llm_editdist_dedup", # full-string threshold-bounded scoring makes
                          # the length banding provably complete
                          # (ADVICE.md r7 recall-gap finding)
    "llm_semantic_dedup", # per-cell cap added to engine AND oracle
                          # (r7 verdict item 4 adversarial backstop)
    "multimodal_audio_windows",  # kernel gained the real-WAV codec
                          # path (r7 verdict item 5); bytes path is
                          # code-identical but routed via audio_windows
    "evt_session_paths",  # per-session frame factored into
                          # session_paths for the streaming twin test
    "llm_dup_span_coverage",  # spans fingerprinted to md5-16 before
                          # the shuffle in engine AND oracle (r8
                          # re-bench: 1.6x at sf1)
    # (the r8-NEW keys dq_ks_drift / dq_chi2_drift / llm_zipf_fit /
    # join_waiting_supplier gained degenerate-input guards or plan
    # reworks within the round, before any driver grade — they are
    # already in the new-key window, no re-grade entry needed.)
    "agg_stats",          # dstddev helper gained the n<2 NULL guard in
                          # engine AND oracle (single-row sweep find) —
                          # transitive-dependency re-grade
    # --- NULL-injection hardening (third session; no-ops on the
    # pristine driver corpus — see tools/null_sweep.py findings) ---
    "win_distribution",   # NULL ordering DECLARED (nulls-first) in
                          # engine AND oracle; identical when the
                          # measure has no NULLs
    "agg_approx_percentile",  # exact rank legs exclude NULL prices,
                          # matching percentile_approx's own skip
    "llm_token_budget_sample",  # transitive: _cumsum_from_buckets
                          # offsets join made null-safe (NULL-lang
                          # group no longer dropped)
    "llm_quality_stratified",   # transitive: same helper edit
    "multimodal_features",      # media_df drops NULL-text payloads
                          # (missing-blob semantic) — decode kernels
                          # threw on None content (--text sweep)
    "multimodal_dedup",         # same boundary filter
    "multimodal_frame_sample",  # same boundary filter
)


# Never-graded keys that must take the FIRST slots of this round's
# window (flagships deferred out of a previous round's full window).
# r4: none — every registered key has a driver row; the window leads
# with the ROUND_MODIFIED rewrites instead.
DRIVER_PRIORITY: tuple[str, ...] = ()


def load_all() -> dict[str, Query]:
    """Import every operator module so registrations run, then return.

    The returned dict is ordered driver-window-first:
    1. ``DRIVER_PRIORITY`` — never-graded flagships, absolutely first;
    2. other keys with no driver CORRECTNESS row yet (new this round);
    3. ``ROUND_MODIFIED`` — previously green keys rewritten this round,
       queued for re-grade;
    4. everything else (stable green; local parity still covers them).
    """
    from .operators import (  # noqa: F401
        checkout,
        clustering,
        events_analytics,
        lakehouse,
        llm,
        llm_advanced,
        llm_curate,
        llm_ingest,
        llm_prep,
        llm_retrieval,
        multimodal,
        quality,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        relational6,
        relational7,
        scalar_fns,
        streaming_analogues,
        windows,
    )

    ordered: dict[str, Query] = {}
    for key in DRIVER_PRIORITY:
        if key in QUERIES:
            ordered[key] = QUERIES[key]
    for key, q in QUERIES.items():
        if key not in DRIVER_VERIFIED:
            ordered.setdefault(key, q)
    # ROUND_MODIFIED's own order (behavioral rewrites before
    # pristine-no-op hardening) decides which re-grades make the
    # window when candidates exceed the remaining slots.
    for key in ROUND_MODIFIED:
        if key in QUERIES:
            ordered.setdefault(key, QUERIES[key])
    for key, q in QUERIES.items():
        ordered.setdefault(key, q)
    return ordered
