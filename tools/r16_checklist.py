#!/usr/bin/env python
"""Generate the OPTIMIZATION_r16.md operator checklist table.

Joins the full-registry profile sweep (tools/profile_keys.py --all
output) with this round's per-key disposition.  Usage:

    python tools/r16_checklist.py /tmp/profile_all.txt > /tmp/checklist.md
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Keys directly rewritten this round (optimization commits).
CHANGED = {
    "llm_contamination": "scan-local gram dedup (§2.4): corpus distinct() removed, 12→9 jobs",
    "llm_ngram_jaccard_lsh": "scan-local gram dedup (§2.4): −30%",
    "state_inventory_replay": "chunk probe via groupBy count, window pass removed (§2.3): −24%",
    "dq_outlier_iqr": "4 boundary probes batched into 1 job (§2.6): −21%",
    "dq_outlier_mad": "pin-input-first bucketing (§1.2): −37%",
    "agg_weighted_median": "pin-input-first bucketing: −27%",
    "evt_rfm_segments": "pin-input-first bucketing: −12%",
    "evt_gini": "pin-input-first bucketing: −2% (cheap input)",
    "evt_session_duration": "pin-input-first bucketing: −19%",
    "evt_power_users": "pin-input-first bucketing: −17%",
    "dq_ks_drift": "pin-input-first bucketing: −25%",
    "llm_gram_novelty": "pin-input-first bucketing: −32%",
    "agg_abc_classes": "pin-input-first bucketing: −22%",
    "agg_revenue_concentration": "pin-input-first bucketing: −24%",
    "sort_orders_sampled": "pin-input-first bucketing: ±0 (raw-scan input)",
    "llm_phrase_merges": "BPE literal-winner chaining, 0 corpus writes (§1.2/§6): jobs 14→8",
    "llm_bpe_encode": "BPE literal-winner chaining: jobs 17→8, −18% normalized",
    "llm_phrase_merges_sampled": "BPE literal-winner chaining: jobs 14→8",
    "llm_pq_code": "concurrent subspace training (§2.6)",
    "llm_pq_adc_topk": "concurrent subspace training (§2.6)",
    "llm_pq_rerank_topk": "concurrent subspace training: −48%",
    "llm_ivfpq_topk": "coarse+2 subspaces trained concurrently: −52%",
    "llm_ivfpq_indexed": "index build trains 3 quantizers concurrently",
    "llm_ivfpq_index_append": "concurrent subspace training (§2.6)",
    "graph_copurchase_components": "edge-pin A/B: unpinned measured +18% — KEPT pinned (negative result)",
}

# Keys rewritten by the inherited mid-build r16 commits (verified green
# this round; evidence in SCALE.md 'Round 16' + BENCH_THIRD_DECADE).
INHERITED = {
    "llm_lsh_tuning": "shared tuner tail factored for the persisted probe (oracle untouched)",
    "llm_lsh_tuning_persisted": "NEW pay-once jaccard_pair_store probe: 252.5→1.28 s at sf100, exp 0.111",
    "llm_cross_source_dups": "persisted folded span store: exp 0.913→0.768, zero corpus scans in probe",
    "llm_containment_pairs": "shared fingerprint/pair tail factored for the persisted probe",
    "llm_containment_pairs_persisted": "NEW result-proportional pair store: 161.4→0.229 s at sf100",
    "stream_type_counts_tws_ttl": "NEW graded TTL MapState drain (T11 bounded-state branch)",
    "graph_copurchase_triangles": "r15 basket-local edges, driver re-grade queued (ROUND_MODIFIED)",
    "graph_copurchase_local_clustering": "r15 basket-local edges, re-grade queued",
    "graph_link_prediction": "r15 basket-local edges, re-grade queued",
    "llm_split_leakage": "r15 scan-local gram dedup, re-grade queued",
    "llm_item_cf_topk": "r15 DISK_ONLY pins (sf100 OOM fix), re-grade queued",
    "agg_theta_intersect_persisted": "r15 store-tag unification, re-grade queued",
}

# Family-level dispositions for keys examined but deliberately left
# alone, keyed by prefix match (first match wins).
FAMILIES = [
    ("llm_minhash_calibration", "examined: candidate frame pinned, gated fp explode, scan-local sizes (r14/r15 work) — no further win without changing the sweep's semantics; persisted probe is the scale path"),
    ("snk_", "examined: sinks are write-dominated by design (pay-once bucket/partition shuffle); plan audit r15 EXPLAIN.md holds — 0/1 exchanges, bucket-to-bucket SMJ"),
    ("scan_", "examined: bare parquet scans — pushdown/pruning only, nothing above the scan"),
    ("src_", "examined: ingest parses are scan-local expressions; malformed channel rides the same scan"),
    ("filter_", "examined: single pushed filter + projection, plan-audited (PushedFilters reach the scan)"),
    ("project_", "examined: pure projection, ReadSchema pruned"),
    ("join_", "examined: join strategy audited r15 (broadcast dims, SMJ facts, AQE skew) — single-action plans, no serial actions"),
    ("setop_", "examined: set ops are single-exchange plans"),
    ("topk_", "examined: TakeOrderedAndProject (per-partition heaps, no total sort)"),
    ("sort_orders", "examined: two-pass bucketed global rank (no single-partition sort); one-pass pinned input"),
    ("agg_approx", "examined: sketch aggregates — constant-memory, mergeable, single pass"),
    ("agg_theta", "examined: KMV sketch algebra, persisted store variant carries the scale story"),
    ("agg_hll", "examined: HLL union/intersect — mergeable partial aggregates"),
    ("agg_", "examined: single-action aggregate plans with map-side partials; no redundant passes found in job profile"),
    ("win_", "examined: keyed windows (no unpartitioned data-scale window); one shuffle each"),
    ("fn_", "examined: scalar expression batteries — scan-local, zero shuffles"),
    ("dq_referential_integrity", "examined: 7 anti-join legs fused in ONE action; job profile shows AQE stage jobs, not serial actions"),
    ("dq_pk_uniqueness", "examined: 10 key collapses in one union plan — compute-bound, map-side partials"),
    ("dq_", "examined: audit plans fused per table; single action each (except the bucketed-rank consumers, changed above)"),
    ("evt_ewma", "examined: chunked fold with O(1) carry — actions bounded by chunk count, not data"),
    ("evt_", "examined: one keyed shuffle + bounded windows; job profile clean"),
    ("state_ledger", "examined: availableNow applyInPandasWithState — two-run min absorbs sink setup; remaining cost is fixed streaming machinery (attribution measured in bench.py r16 notes)"),
    ("stream_", "examined: availableNow streaming analogues — fixed plan+launch overhead dominates at sf0.1 (stream_session measured ~0.4 s fixed across 100× data); data path is keyed state, scales"),
    ("txn_settlement", "examined: one product_id shuffle shared by window+join, one order_id fold; 9 jobs are AQE broadcast stages"),
    ("cdc_", "examined: MERGE-shape join + window, single action"),
    ("snapshot_diff", "examined: full-outer hash compare, single exchange pair"),
    ("ddl_bootstrap", "examined: 5-row VALUES plan"),
    ("state_inventory", "changed (probe) — see above"),
    ("llm_exact_dedup", "examined: md5 + dropDuplicates — one exchange, bucketable at scale"),
    ("llm_near_dedup_groups", "examined: shares the pinned-bucket CC fixpoint (bucket-min init, ~2 rounds)"),
    ("llm_near_dedup", "examined: scan-local sigs + one band shuffle + capped in-row pair expansion"),
    ("llm_minhash_signatures", "examined: zero-shuffle scan-local array folds"),
    ("llm_simhash", "examined: scan-local fingerprints + pigeonhole banding"),
    ("llm_embedding_near_dup", "examined: sign-bucket blocking, norm precomputed once"),
    ("llm_semantic_dedup", "examined: single seeded-Lloyd + cell-capped pair join; training is 3 bounded actions (k-row collects) — no overlap partner"),
    ("llm_similarity_ivf", "examined: learned-cell IVF, probe-pruned exact leg"),
    ("llm_similarity_topk", "examined: brute-force oracle kept as recall baseline (by design)"),
    ("llm_kmeans_refine", "examined: one Lloyd round, numpy batch kernel (6× vs expressions, r11)"),
    ("llm_embedding_", "examined: moment-scan memoized per session; d² single pass"),
    ("llm_pca", "examined: shares the memoized moment scan; deflation is k small jobs"),
    ("llm_pq_", "changed/examined: see concurrent-training row"),
    ("llm_incremental_", "examined: persisted-index probes — cycle-1 build, recurring probe reads index partitions only"),
    ("llm_cm_", "examined: Count-Min sketches — mergeable aggregates, persisted/windowed variants store-backed"),
    ("llm_", "examined: collapse-before-join discipline (token/gram frames), df caps on every pair expansion; job profile clean"),
    ("graph_pagerank", "examined: pinned edges, 3 in-plan iterations, zero parquet scans in final plan (contract-pinned)"),
    ("graph_", "examined: basket-local edge build (r15), support caps, CC fixpoint log-diameter"),
    ("multimodal_", "examined: struct/array carried losslessly; Arrow fan-out for media windows"),
    ("evt", "examined"),
]


def main() -> None:
    prof = {}
    calib = None
    for line in open(sys.argv[1]):
        if line.startswith("# calibration"):
            calib = line.split("\t")[1].strip()
            continue
        k, wall, jobs, stages = line.strip().split("\t")
        prof[k] = (float(wall), int(jobs), int(stages))

    from event_stream_checkout_spark.registry import load_all

    keys = sorted(load_all())
    print(f"Sweep calibration: {calib} s (see host-noise caveat above).\n")
    print("| key | sf0.1 s | jobs | disposition |")
    print("|---|---|---|---|")
    n_changed = n_inherited = n_examined = 0
    for k in keys:
        wall, jobs, _ = prof.get(k, (float("nan"), 0, 0))
        if k in CHANGED:
            disp = f"**changed** — {CHANGED[k]}"
            n_changed += 1
        elif k in INHERITED:
            disp = f"**inherited r16** — {INHERITED[k]}"
            n_inherited += 1
        else:
            disp = next(
                (note for pref, note in FAMILIES if k.startswith(pref)),
                "examined: single-action plan, job profile clean",
            )
            n_examined += 1
        print(f"| {k} | {wall:.2f} | {jobs} | {disp} |")
    print(
        f"\n{len(keys)} keys: {n_changed} changed this round, "
        f"{n_inherited} inherited-r16 rewrites, {n_examined} examined "
        f"and left alone."
    )


if __name__ == "__main__":
    main()
