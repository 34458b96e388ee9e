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


def test_duplicate_orders_pairs(spark):
    """Every reported pair shares customer and calendar day, keys are
    ordered, and the count matches an independent group-size
    computation (sum of C(n,2) over 2..cap groups)."""
    from pyspark.sql import functions as F

    from event_stream_checkout_spark.operators.quality import (
        _DUP_GROUP_CAP,
        q_dq_duplicate_orders,
    )
    from event_stream_checkout_spark.tables import load_table

    rows = q_dq_duplicate_orders(spark, "/root/testdata/sf0.01").collect()
    assert rows, "sf0.01 carries same-day duplicate orders"
    assert all(r["key_a"] < r["key_b"] for r in rows)
    o = load_table(spark, "/root/testdata/sf0.01", "orders")
    sizes = (
        o.groupBy("o_custkey", F.col("o_orderdate").cast("date"))
        .count()
        .filter(F.col("count").between(2, _DUP_GROUP_CAP))
        .select("count")
        .collect()
    )
    expected = sum(n["count"] * (n["count"] - 1) // 2 for n in sizes)
    assert len(rows) == expected


def test_weighted_median_law(spark):
    """The weighted median must satisfy its defining inequality:
    weight at-or-below >= half the total, weight strictly-below <
    half — checked against an independent full recomputation."""
    from pyspark.sql import functions as F

    from event_stream_checkout_spark.operators.relational3 import (
        q_agg_weighted_median,
    )
    from event_stream_checkout_spark.tables import load_table

    got = {
        r["l_returnflag"]: r
        for r in q_agg_weighted_median(spark, SF_DIR).collect()
    }
    li = load_table(spark, SF_DIR, "lineitem")
    for flag, r in got.items():
        m, tw = r["weighted_median"], r["total_weight"]
        base = li.filter(F.col("l_returnflag") == flag)
        at_or_below = (
            base.filter(F.col("l_extendedprice") <= m)
            .agg(F.sum("l_quantity"))
            .collect()[0][0]
        )
        strictly_below = (
            base.filter(F.col("l_extendedprice") < m)
            .agg(F.sum("l_quantity"))
            .collect()[0][0]
        ) or 0
        assert 2 * at_or_below >= tw, (flag, at_or_below, tw)
        assert 2 * strictly_below < tw, (flag, strictly_below, tw)


def test_lsh_tuning_scurve_laws(spark):
    """S-curve sanity on the tuner output: per config, candidate mass
    decomposes exactly into tp + fp; more bands (lower threshold) can
    only RAISE expected candidates and tp; every expectation is
    bounded by its population."""
    from event_stream_checkout_spark.operators.llm_advanced import (
        q_llm_lsh_tuning,
    )

    rows = sorted(
        q_llm_lsh_tuning(spark, SF_DIR).collect(),
        key=lambda r: -r["bands"],
    )
    assert [(
        r["bands"], r["rows_per_band"]) for r in rows
    ] == [(8, 1), (4, 2), (2, 4), (1, 8)]
    for r in rows:
        assert abs(r["exp_candidates"] - (r["exp_tp"] + r["exp_fp"])) < 1e-3
        assert 0.0 <= r["exp_tp"] <= r["n_high"] + 1e-6
        assert 0.0 <= r["exp_fp"] <= (r["n_pairs"] - r["n_high"]) + 1e-6
    for hi, lo in zip(rows, rows[1:]):
        assert hi["exp_candidates"] >= lo["exp_candidates"] - 1e-6
        assert hi["exp_tp"] >= lo["exp_tp"] - 1e-6
        assert hi["threshold"] < lo["threshold"]


def test_copurchase_components_structure(spark):
    """Component structure laws on the real corpus: labels are
    component minima (every component id is a member part), sizes
    sum to the node count, edges partition across components (an
    edge never crosses — both endpoints carry the same label), and
    per-component edge counts sum to the total edge count."""
    from pyspark.sql import functions as F

    from event_stream_checkout_spark.operators.relational9 import (
        _COPURCHASE_MIN_SUP,
        q_graph_copurchase_components,
    )
    from event_stream_checkout_spark.tables import load_table

    rows = q_graph_copurchase_components(spark, SF_DIR).collect()
    assert rows, "co-purchase components exist at sf0.001"
    # independent edge recomputation
    pp = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = pp.alias("a"), pp.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"),
            F.col("b.l_partkey").alias("pb"),
        )
        .agg(F.count(F.lit(1)).alias("sup"))
        .filter(F.col("sup") >= _COPURCHASE_MIN_SUP)
    )
    n_edges = e.count()
    n_nodes = (
        e.select(F.col("pa").alias("p"))
        .unionAll(e.select(F.col("pb").alias("p")))
        .distinct()
        .count()
    )
    assert sum(r["n_parts"] for r in rows) == n_nodes
    assert sum(r["n_edges"] for r in rows) == n_edges
    # every component has at least 2 members (nodes come from edges)
    assert all(r["n_parts"] >= 2 for r in rows)
    # sizes are reported in descending order
    sizes = [r["n_parts"] for r in rows]
    assert sizes == sorted(sizes, reverse=True)


def test_assign_empty_centroids(spark):
    """Degenerate guard: an empty centroid frame (empty training
    corpus) yields an empty assignment with the right schema, like
    the expression path's empty-broadcast join — not a numpy shape
    error inside the Arrow kernel."""
    from pyspark.sql import functions as F

    from event_stream_checkout_spark.operators.clustering import _assign
    from event_stream_checkout_spark.tables import load_table

    e = load_table(spark, SF_DIR, "embeddings")
    empty_cents = (
        e.filter(F.lit(False))
        .select(
            F.col("vec_id").alias("cluster"),
            F.transform(F.col("embedding"), lambda v: v.cast("double")).alias(
                "carr"
            ),
        )
    )
    out = _assign(e, empty_cents)
    assert out.columns == ["vec_id", "cluster", "dq"]
    assert out.count() == 0
