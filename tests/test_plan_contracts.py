"""Plan contracts: the scale properties VERDICT/SCALE.md claim are
asserted here against the actual executed plans, so a future edit that
silently reintroduces a scale-killer (forced broadcast of a growing
table, a single-partition data stage, lost predicate pushdown, lost
partial aggregation) fails CI instead of surviving to a 100 TB run.

Plans are taken AFTER execution (noop sink) so AQE's final choices are
what gets checked, at sf0.001 for speed — the invariants below are
scale-free (they hold at any SF).
"""

from __future__ import annotations

import re

import pytest

from event_stream_checkout_spark.registry import load_all
from tests.conftest import SF_DIR

QUERIES = load_all()


def executed_plan(spark, key: str) -> str:
    # Wide scans (lineitem has 16 columns) get their field lists elided
    # by toString at the default maxToStringFields=25, and FileScan
    # metadata entries (PushedFilters among them) get cut at
    # maxMetadataStringLength=100 chars — which swallows the closing
    # ']' of PushedFilters.  Raise both so assertions see full node
    # text — and RESTORE them after (shared session fixture; leaking
    # debug confs into later tests was an r3 advisor finding).
    _DEBUG_CONFS = {
        "spark.sql.debug.maxToStringFields": "1000",
        "spark.sql.maxMetadataStringLength": "10000",
    }
    saved = {k: spark.conf.get(k, None) for k in _DEBUG_CONFS}
    for k, v in _DEBUG_CONFS.items():
        spark.conf.set(k, v)
    try:
        df = QUERIES[key].fn(spark, SF_DIR)
        # Execute THIS Dataset's own QueryExecution (a noop write would
        # spawn a separate one, leaving df's AdaptiveSparkPlan at
        # isFinalPlan=false — we'd be asserting on the pre-AQE initial
        # plan).  sf0.001 results are tiny, so collect() is safe here.
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, prior in saved.items():
            if prior is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, prior)
    # AdaptiveSparkPlan's toString prints "== Final Plan ==" followed by
    # "== Initial Plan ==" — keep only the final (post-AQE) section so
    # node counts aren't doubled by the pre-AQE copy.
    return plan.split("== Initial Plan ==")[0]


def test_txn_settlement_minimal_shuffles(spark):
    """The flagship settles with exactly the two semantic shuffles
    (product window, order fold) — no accidental extra exchange."""
    plan = executed_plan(spark, "txn_settlement")
    n_hash = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_hash <= 2, f"expected <=2 hash exchanges, saw {n_hash}"
    assert "SortMergeJoin" not in plan  # bounded dims broadcast at this SF


def test_agg_filtered_sum_pushdown(spark):
    """Q6 shape: every predicate reaches the parquet scan."""
    plan = executed_plan(spark, "agg_filtered_sum")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "l_shipdate" in m.group(1), "shipdate filter not pushed"


def test_agg_pricing_summary_partial_final(spark):
    """Q1 shape: map-side partial aggregation before the exchange."""
    plan = executed_plan(spark, "agg_pricing_summary")
    assert "partial_" in plan or "HashAggregate" in plan
    # partial agg means exactly one data exchange for the group-by
    n_hash = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_hash == 1, f"expected 1 exchange (partial+final agg), saw {n_hash}"


def test_sort_orders_no_single_partition_data_stage(spark):
    """The two-pass global rank: the only SinglePartition stage is the
    O(#buckets) prefix-count offsets window (post-aggregation, <=32
    rows), never a data-sized one.  The bucketed frame is pinned with a
    localCheckpoint, so the final plan must contain NO parquet scan:
    orders is read exactly once, inside the checkpoint."""
    plan = executed_plan(spark, "sort_orders")
    # The data path shuffles by _pid (hash); a regression to a global
    # window would show rangepartitioning/SinglePartition on the scan
    # side before the big Window.
    n_single = plan.count("Exchange SinglePartition")
    assert n_single <= 1, f"unexpected single-partition stages: {n_single}"
    assert "rangepartitioning" not in plan  # value-derived buckets, no sampling
    # Diamond pinned: both branches read the checkpointed blocks.
    assert plan.count("Scan parquet") == 0, "orders scanned in-plan (diamond unpinned)"


@pytest.mark.parametrize(
    "key", ["join_orders_customer", "join_range", "topk_revenue_orders"]
)
def test_no_forced_broadcast_on_scale_growing_tables(spark, key):
    """AQE owns the join strategy for customer/part joins: the LOGICAL
    plan must carry no broadcast hint (the physical plan may still
    choose broadcast at tiny SF — that is AQE's call, which is the
    point)."""
    df = QUERIES[key].fn(spark, SF_DIR)
    logical = df._jdf.queryExecution().analyzed().toString()
    assert "UnresolvedHint" not in logical
    assert "ResolvedHint (strategy=broadcast)" not in logical
