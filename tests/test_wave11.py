"""Wave-11 operators: the FD audit (V13), the windowed Count-Min
read (X64), and the ANN retrain decision (X63) — semantic properties
on the real driver corpus (oracle equivalence is covered by the
parity harness; these pin the behaviors the oracle can't see, like
branch coverage and sketch upper-bound laws)."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_fd_audit_verdicts(spark):
    """nation → region must HOLD (0 violating groups — the real
    schema invariant in the candidate mix); the per-order supplier
    FD must be violated; rates stay in [0, 1] and every violating
    count is bounded by its group count."""
    from event_stream_checkout_spark.operators.quality import (
        q_dq_fd_violations,
    )

    rows = {r["fd"]: r for r in q_dq_fd_violations(spark, SF_DIR).collect()}
    assert set(rows) == {
        "nation_region",
        "brand_type",
        "order_supplier",
        "customer_status",
        "user_event_type",
    }
    assert rows["nation_region"]["n_violating"] == 0
    assert rows["nation_region"]["max_distinct"] == 1
    assert rows["order_supplier"]["n_violating"] > 0
    for r in rows.values():
        assert 0 <= r["n_violating"] <= r["n_groups"]
        assert 0.0 <= r["violation_rate"] <= 1.0
        assert r["max_distinct"] >= 1


def test_windowed_cm_upper_bound_and_threshold(spark):
    """Count-Min law on the windowed read: every estimate is an
    UPPER bound of the exact windowed count (min over rows of summed
    counters can only overcount via collisions), and every reported
    token clears the integer 1%-of-window threshold."""
    from pyspark.sql import functions as F

    from event_stream_checkout_spark.operators.llm_sketch import (
        _CMW_HI,
        _CMW_LO,
        q_llm_cm_sketch_windowed,
    )
    from event_stream_checkout_spark.tables import load_table

    rows = q_llm_cm_sketch_windowed(spark, SF_DIR).collect()
    assert rows, "windowed heavy hitters must be non-empty"
    assert all(r["est"] >= r["tf"] for r in rows)
    assert all(r["overcount"] == r["est"] - r["tf"] for r in rows)
    # exact windowed stream size, independently recomputed
    d = load_table(spark, SF_DIR, "documents")
    n = (
        d.filter((F.col("doc_id") % 7).between(_CMW_LO, _CMW_HI))
        .select(F.explode(F.split("text", " ", -1)).alias("t"))
        .count()
    )
    assert all(r["est"] * 100 >= n for r in rows)


def test_retrain_decision_branch_coverage(spark):
    """Both rebuild branches and both verdicts must be live on the
    driver corpus: some cells rebuild, some don't, and at least one
    rebuild fires on DRIFT alone (ratio gate false) — the branch a
    threshold tuned too high would silently kill (the KM/EWMA
    vacuous-branch lesson)."""
    from event_stream_checkout_spark.operators.clustering import (
        _RETRAIN_RATIO,
        q_llm_ann_retrain_decision,
    )

    rows = q_llm_ann_retrain_decision(spark, SF_DIR).collect()
    assert len(rows) == 8  # one row per coarse cell
    verdicts = {r["rebuild"] for r in rows}
    assert verdicts == {True, False}, "both verdicts must occur"
    assert any(
        r["rebuild"] and r["n_new"] * _RETRAIN_RATIO < r["n_base"]
        for r in rows
    ), "drift-only rebuild must fire on this corpus"
    for r in rows:
        assert r["n_base"] > 0 and r["drift"] >= 0.0
