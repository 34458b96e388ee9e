"""Round-13b wave: per-node local clustering (G4), item-item CF
similarity (X72), daily peak concurrent sessions (E26), freshness
audit (V18), source vocabulary overlap (X75), KMV quantile sketch
(A39) — semantics on synthetic frames where the answer is known by
construction, plus plan contracts pinning each operator's scale
claim."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from event_stream_checkout_spark.registry import load_all
from tests.conftest import SF_DIR
from tests.test_plan_contracts import executed_plan

QUERIES = load_all()


# ---------------------------------------------------------------------------
# G4: local clustering coefficients
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(
        [Row(pa=a, pb=b) for a, b in pairs]
    ).localCheckpoint()


def test_closed_triangles_enumerates_each_once(spark):
    """Triangle + pendant: exactly one closed triple, each corner
    reported once; the pendant and the star below never close."""
    from event_stream_checkout_spark.operators.relational9 import (
        _closed_triangles,
    )

    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])
    tris = [
        tuple(sorted((r["u"], r["v"], r["w"])))
        for r in _closed_triangles(e).collect()
    ]
    assert tris == [(1, 2, 3)]

    # a star (hub 0, leaves 10..14) has wedges but zero triangles
    star = _edges(spark, [(0, leaf) for leaf in range(10, 15)])
    assert _closed_triangles(star).count() == 0


def test_local_clustering_known_graph(spark):
    """Triangle {1,2,3} + pendant edge (3,4): nodes 1 and 2 have
    coefficient 1.0 (their single neighbor pair is closed), node 3
    has 2·1/(3·2) = 1/3, node 4 (degree 1) is excluded.  Recomputed
    through the same corner/degree algebra the registered key uses."""
    from event_stream_checkout_spark.operators.relational9 import (
        _closed_triangles,
    )

    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])
    tri = _closed_triangles(e)
    corners = (
        tri.select(F.col("u").alias("n"))
        .unionAll(tri.select(F.col("v").alias("n")))
        .unionAll(tri.select(F.col("w").alias("n")))
    )
    tc = {r["n"]: r["t"] for r in corners.groupBy("n").agg(
        F.count(F.lit(1)).alias("t")
    ).collect()}
    assert tc == {1: 1, 2: 1, 3: 1}


def test_local_clustering_registered_key(spark):
    out = QUERIES["graph_copurchase_local_clustering"].fn(
        spark, SF_DIR
    ).collect()
    assert 0 < len(out) <= 20
    coeffs = [r["local_clustering"] for r in out]
    assert coeffs == sorted(coeffs, reverse=True)
    for r in out:
        assert r["degree"] >= 2
        assert 0.0 <= r["local_clustering"] <= 1.0
        # triangles at a node can't exceed its neighbor pairs
        assert r["n_triangles"] <= r["degree"] * (r["degree"] - 1) // 2


def test_local_clustering_rides_pinned_edges(spark):
    """G4 scale contract (the G3 stance): everything past the pinned
    edge frame — corners, degrees, the top-20 — runs over the
    checkpoint; no lineitem re-scan, no cartesian."""
    plan = executed_plan(
        spark, "graph_copurchase_local_clustering", full=True
    )
    assert "lineitem" not in plan, "fact table re-scanned past the pin"
    assert "CartesianProduct" not in plan
    assert "TakeOrdered" in plan, "top-20 should be a TakeOrdered, not a sort"


# ---------------------------------------------------------------------------
# X72: item-item CF
# ---------------------------------------------------------------------------


def test_item_cf_known_baskets(spark):
    """Baskets {1,2} ×2, {1,3} ×2, {2,3} ×1: co(1,2)=co(1,3)=2 survive
    the support gate, co(2,3)=1 dies; n1=4, n2=3, n3=3, so both
    surviving cosines are 2/sqrt(12) and each item's neighbor list is
    exactly its surviving partners."""
    from event_stream_checkout_spark.operators.relational10 import (
        item_cf_topk,
    )

    rows = []
    for o, basket in enumerate(
        [(1, 2), (1, 2), (1, 3), (1, 3), (2, 3)], start=100
    ):
        rows += [Row(l_orderkey=o, l_partkey=p) for p in basket]
    pp0 = spark.createDataFrame(rows).distinct().localCheckpoint()
    out = {
        (r["item"], r["neighbor"]): r for r in item_cf_topk(pp0).collect()
    }
    c12 = 2.0 / (4 * 3) ** 0.5
    c13 = 2.0 / (4 * 3) ** 0.5
    assert set(out) == {(1, 2), (1, 3), (2, 1), (3, 1)}
    assert out[(1, 2)]["cosine"] == pytest.approx(round(c12, 6))
    assert out[(1, 3)]["cosine"] == pytest.approx(round(c13, 6))
    assert out[(1, 2)]["co_orders"] == 2
    # item 1's two equal-cosine neighbors tie-break by neighbor id
    assert out[(1, 2)]["rnk"] == 1 and out[(1, 3)]["rnk"] == 2


def test_item_cf_oversized_basket_contributes_zero(spark):
    """The G2 basket gate applies BEFORE pair expansion: one 40-part
    basket (outside 2..32) forms no pairs and no counts."""
    from event_stream_checkout_spark.operators.relational10 import (
        item_cf_topk,
    )

    rows = [Row(l_orderkey=1, l_partkey=p) for p in range(40)]
    # two clean co-purchases so the output isn't empty
    rows += [Row(l_orderkey=2, l_partkey=p) for p in (50, 51)]
    rows += [Row(l_orderkey=3, l_partkey=p) for p in (50, 51)]
    pp0 = spark.createDataFrame(rows).distinct().localCheckpoint()
    out = item_cf_topk(pp0).collect()
    items = {r["item"] for r in out} | {r["neighbor"] for r in out}
    assert items == {50, 51}
    # gated counts: n50 = n51 = 2 baskets → cosine = 2/sqrt(4) = 1.0
    assert all(r["cosine"] == 1.0 for r in out)


def test_item_cf_rank_limit_pushdown(spark):
    """Scale contract: the per-item top-k filter is pushed into the
    shuffle as WindowGroupLimit — no partition ranks an item's full
    neighbor list before the cut."""
    plan = executed_plan(spark, "llm_item_cf_topk", full=True)
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# E26: daily peak concurrency
# ---------------------------------------------------------------------------


def _ts(day, h, m, s=0):
    return dt.datetime(2024, 3, day, h, m, s)


def test_peak_concurrency_overlap_and_midnight(spark):
    """User A's session spans midnight (23:50 → 00:10 next day, one
    30-min-gap session); user B overlaps it on day 2.  Day 1 peak is
    2 (A and C overlap), day 2 peak is 2 (carry-in A + B)."""
    from event_stream_checkout_spark.operators.events_analytics import (
        daily_peak_concurrency,
    )

    rows = [
        # A: one session 23:50 → 00:10 (gap 20 min < 30)
        Row(user_id=1, event_id=1, ts=_ts(1, 23, 50)),
        Row(user_id=1, event_id=2, ts=_ts(2, 0, 10)),
        # C: day-1 session overlapping A's start
        Row(user_id=3, event_id=5, ts=_ts(1, 23, 45)),
        Row(user_id=3, event_id=6, ts=_ts(1, 23, 55)),
        # B: single-event day-2 session while A is still open
        Row(user_id=2, event_id=3, ts=_ts(2, 0, 5)),
    ]
    out = {
        str(r["day"]): r
        for r in daily_peak_concurrency(spark.createDataFrame(rows)).collect()
    }
    assert out["2024-03-01"]["n_started"] == 2
    assert out["2024-03-01"]["peak_concurrency"] == 2
    assert out["2024-03-02"]["n_started"] == 1
    # carry-in (A, still open at midnight) + B
    assert out["2024-03-02"]["peak_concurrency"] == 2


def test_peak_concurrency_handoff_counts_as_overlap(spark):
    """+1 sorts before −1 at equal timestamps: a session ending at the
    exact instant another starts counts as 2 concurrent — the declared
    closed-interval semantic."""
    from event_stream_checkout_spark.operators.events_analytics import (
        daily_peak_concurrency,
    )

    rows = [
        Row(user_id=1, event_id=1, ts=_ts(5, 10, 0)),
        Row(user_id=1, event_id=2, ts=_ts(5, 10, 20)),
        Row(user_id=2, event_id=3, ts=_ts(5, 10, 20)),
        Row(user_id=2, event_id=4, ts=_ts(5, 10, 40)),
    ]
    out = daily_peak_concurrency(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    assert out[0]["peak_concurrency"] == 2


def test_peak_concurrency_day_partitioned_sweep(spark):
    """Scale contract: the data-scale running sum is partitioned by
    day; the only unpartitioned window is the carry cumsum over the
    per-day aggregate (≤ #days rows, the A36 collapsed-domain
    stance)."""
    plan = executed_plan(spark, "evt_peak_concurrency", full=True)
    day_windows = [
        ln
        for ln in plan.splitlines()
        if "Window" in ln and "windowspecdefinition(day" in ln
    ]
    assert day_windows, plan


# ---------------------------------------------------------------------------
# V18: freshness audit
# ---------------------------------------------------------------------------


def test_freshness_known_ages(spark):
    """Type 'live' owns the high-water mark (age 0, fresh); type
    'dead' last emitted 100 h earlier (stale at the 72 h threshold);
    trend ratio is NULL when the prior week is empty."""
    from event_stream_checkout_spark.operators.quality import (
        freshness_report,
    )

    hw = dt.datetime(2024, 6, 30, 12, 0, 0)
    rows = [
        Row(event_type="live", ts=hw),
        Row(event_type="live", ts=hw - dt.timedelta(days=1)),
        Row(event_type="live", ts=hw - dt.timedelta(days=10)),
        Row(event_type="dead", ts=hw - dt.timedelta(hours=100)),
    ]
    out = {
        r["event_type"]: r
        for r in freshness_report(spark.createDataFrame(rows)).collect()
    }
    live, dead = out["live"], out["dead"]
    assert live["age_hours"] == 0 and live["is_stale"] is False
    assert live["n_last_7d"] == 2 and live["n_prev_7d"] == 1
    assert live["trend_ratio"] == 2.0
    assert dead["age_hours"] == 100 and dead["is_stale"] is True
    # dead's one event is 100 h < 7 d old → in the trailing week,
    # nothing in the week before → NULL ratio, not a division blowup
    assert dead["n_last_7d"] == 1 and dead["n_prev_7d"] == 0
    assert dead["trend_ratio"] is None


def test_freshness_fused_single_aggregate(spark):
    """Scale contract: all per-type measures fuse into one conditional
    aggregate — exactly two events scans in the plan (the 1-row
    high-water mark + the fused pass), never one per measure."""
    plan = executed_plan(spark, "dq_freshness", full=True)
    # count in the AQE final plan only (full=True appends the Initial
    # Plan section, which duplicates every scan node)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("events.parquet") <= 2, plan


# ---------------------------------------------------------------------------
# X75: source vocabulary overlap
# ---------------------------------------------------------------------------


def test_vocab_overlap_known_corpus(spark):
    from event_stream_checkout_spark.operators.llm_curate import (
        source_vocab_overlap,
    )

    d = spark.createDataFrame(
        [
            Row(source="s1", text="a b c"),
            Row(source="s1", text="b c"),  # dup tokens collapse
            Row(source="s2", text="b c d"),
            Row(source="s3", text="x"),
        ]
    )
    out = {
        (r["source_a"], r["source_b"]): r
        for r in source_vocab_overlap(d).collect()
    }
    # zero-overlap pairs (s1,s3), (s2,s3) are absent by declared semantic
    assert set(out) == {("s1", "s2")}
    r = out[("s1", "s2")]
    assert (r["vocab_a"], r["vocab_b"], r["n_shared"]) == (3, 3, 2)
    assert r["jaccard"] == 0.5


def test_vocab_overlap_pre_collapses_before_pair_join(spark):
    """Scale contract: the token self-join consumes the DISTINCT
    (source, token) checkpoint — hot tokens land once per source, and
    the raw documents scan never feeds the join directly."""
    plan = executed_plan(spark, "llm_source_vocab_overlap", full=True)
    assert "documents" not in plan, "corpus re-scanned past the pin"
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# A39: KMV quantile sketch
# ---------------------------------------------------------------------------


def test_kmv_sample_bounded_and_deterministic(spark):
    from event_stream_checkout_spark.operators.relational5 import (
        _KMVQ_K,
        _kmv_row_sample,
    )

    rows = [
        Row(event_type="t", event_id=i, value=float(i)) for i in range(5000)
    ]
    e = spark.createDataFrame(rows)
    s1 = {r["event_id"] for r in _kmv_row_sample(e, _KMVQ_K).collect()}
    s2 = {r["event_id"] for r in _kmv_row_sample(e, _KMVQ_K).collect()}
    assert len(s1) == _KMVQ_K
    assert s1 == s2, "hash-ordered sample must be run-stable"


def test_kmv_sample_quantile_within_dkw(spark):
    """On 5000 known values the k=1024 sample median/p90 land within
    the graded ±0.08 CDF bound of the true quantiles."""
    from event_stream_checkout_spark.operators.relational5 import (
        _KMVQ_EPS,
        _KMVQ_K,
        _kmv_row_sample,
    )

    n = 5000
    rows = [
        Row(event_type="t", event_id=i, value=float(i * i)) for i in range(n)
    ]
    e = spark.createDataFrame(rows)
    import math

    samp = sorted(
        r["value"] for r in _kmv_row_sample(e, _KMVQ_K).collect()
    )
    for p in (0.5, 0.9):
        # the engine's estimator: sample value at rank ceil(p·k)
        qhat = samp[max(1, math.ceil(p * len(samp))) - 1]
        # exact CDF over the full frame: values are i², so
        # count(values <= qhat) = isqrt(qhat) + 1
        cdf = (math.isqrt(int(qhat)) + 1) / n
        assert abs(cdf - p) <= _KMVQ_EPS, (p, qhat, cdf)


def test_kmv_quantiles_registered_key(spark):
    out = QUERIES["agg_kmv_quantiles"].fn(spark, SF_DIR).collect()
    assert len(out) == 10  # 5 types × 2 quantiles
    assert all(r["in_bound"] for r in out)


def test_kmv_quantiles_two_phase_topk_plan(spark):
    """Scale contract (the A37 stance): the k-smallest sample runs as
    a salted partial window before the per-type final, with rank-limit
    pushdown bounding every partition sort at k.  Inspected on the
    sample pipeline itself (the A37 test shape — the registered key
    composes further joins on top that don't disturb the sample's
    plan)."""
    import re

    from event_stream_checkout_spark.operators.relational5 import (
        _KMVQ_K,
        _kmv_row_sample,
    )
    from event_stream_checkout_spark.tables import load_table

    e = (
        load_table(spark, SF_DIR.rsplit("/", 1)[0] + "/sf0.001", "events")
        .select("event_type", "event_id", "value")
        .filter(F.col("value").isNotNull())
    )
    plan = (
        _kmv_row_sample(e, _KMVQ_K)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    windows = [
        ln
        for ln in plan.splitlines()
        if re.search(r"\bWindow \[row_number", ln)
    ]
    assert any("salt" in w for w in windows), "salted partial missing"
    assert any("salt" not in w for w in windows), "final top-k missing"
    assert "WindowGroupLimit" in plan


# ---------------------------------------------------------------------------
# G5: link prediction
# ---------------------------------------------------------------------------


def test_link_prediction_square(spark):
    """4-cycle 1-2-3-4-1: diagonals (1,3) and (2,4) each share two
    middles, are non-edges, and every degree is 2 — both predicted
    with cn=2, jaccard=1.0; nothing else qualifies."""
    from event_stream_checkout_spark.operators.relational9 import (
        link_prediction,
    )

    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    out = {
        (r["part_a"], r["part_b"]): r for r in link_prediction(e).collect()
    }
    assert set(out) == {(1, 3), (2, 4)}
    for r in out.values():
        assert r["common_neighbors"] == 2
        assert r["jaccard"] == 1.0


def test_link_prediction_hub_contributes_nothing(spark):
    """A hub above the middle-degree cap (70 leaves) is gated out of
    the wedge join: its leaf pairs share ONLY the hub, so zero
    predictions come from it — the C(deg,2) blowup never forms."""
    from event_stream_checkout_spark.operators.relational9 import (
        _LP_MID_DEG_CAP,
        link_prediction,
    )

    hub_edges = [(1000, leaf) for leaf in range(1, _LP_MID_DEG_CAP + 7)]
    # plus a clean square so the output isn't vacuously empty
    sq = [(2001, 2002), (2002, 2003), (2003, 2004), (2001, 2004)]
    e = _edges(spark, hub_edges + sq)
    out = link_prediction(e).collect()
    parts = {r["part_a"] for r in out} | {r["part_b"] for r in out}
    assert parts == {2001, 2002, 2003, 2004}


def test_link_prediction_excludes_existing_edges(spark):
    """A triangle's pairs all share a middle but every pair is already
    an edge — the anti-join leaves nothing."""
    from event_stream_checkout_spark.operators.relational9 import (
        link_prediction,
    )

    e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    assert link_prediction(e).count() == 0


# ---------------------------------------------------------------------------
# X77: template prefixes
# ---------------------------------------------------------------------------


def test_template_prefix_groups_known(spark):
    from event_stream_checkout_spark.operators.llm_curate import (
        template_prefix_groups,
    )

    d = spark.createDataFrame(
        [
            Row(doc_id=1, source="a", text="terms of service apply here"),
            Row(doc_id=2, source="b", text="terms of service differ a lot"),
            Row(doc_id=3, source="a", text="totally unique document text"),
        ]
    )
    out = template_prefix_groups(d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["prefix"] == "terms of service"
    assert r["n_docs"] == 2 and r["n_sources"] == 2 and r["first_doc"] == 1


def test_template_prefix_scan_local_slice(spark):
    """Scale contract: the prefix derives scan-locally (split+slice,
    no explode/Generate) — the corpus never fans out to tokens."""
    plan = executed_plan(spark, "llm_template_prefix_groups", full=True)
    assert "Generate" not in plan, "prefix must not explode tokens"


# ---------------------------------------------------------------------------
# W6: LOCF gap fill
# ---------------------------------------------------------------------------


def test_gap_fill_locf_semantics(spark):
    """Reading 10 → two errors → reading 20: both gaps fill with 10;
    a user whose FIRST event is an error stays unfillable."""
    from event_stream_checkout_spark.operators.windows import (
        gap_fill_daily,
    )

    d0 = dt.datetime(2024, 7, 1, 9, 0, 0)
    rows = [
        Row(user_id=1, event_id=1, ts=d0, event_type="view", value=10.0),
        Row(user_id=1, event_id=2, ts=d0 + dt.timedelta(minutes=1),
            event_type="error", value=99.0),
        Row(user_id=1, event_id=3, ts=d0 + dt.timedelta(minutes=2),
            event_type="error", value=99.0),
        Row(user_id=1, event_id=4, ts=d0 + dt.timedelta(minutes=3),
            event_type="view", value=20.0),
        Row(user_id=2, event_id=5, ts=d0, event_type="error", value=99.0),
    ]
    out = gap_fill_daily(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_readings"] == 2
    assert r["n_filled"] == 2
    assert r["n_unfillable"] == 1
    # 10 + 10 + 10 + 20 (user 2's unfillable NULL adds nothing)
    assert r["sum_filled"] == 50.0


def test_gap_fill_single_user_shuffle(spark):
    """Scale contract: one user_id-partitioned window serves the fill;
    no unpartitioned window touches the event stream."""
    plan = executed_plan(spark, "win_gap_fill_locf", full=True)
    assert "SinglePartition" not in plan.split("== Initial Plan ==")[0], plan


# ---------------------------------------------------------------------------
# r13 code-review fixes: NULL-membership contracts
# ---------------------------------------------------------------------------


def test_theta_intersect_excludes_null_members(spark):
    """A37: NULL user_id rows are excluded at entry (declared both
    engines) — otherwise the engine's anti-join leg counts the NULL
    row into only_a while the oracle's count(DISTINCT) skips it, and
    xxhash64(NULL) would inject the seed as a phantom member of BOTH
    sketches.  Pinned via the scan filter."""
    plan = executed_plan(spark, "agg_theta_intersect", full=True)
    assert "isnotnull(user_id" in plan, plan


def test_kmv_quantiles_null_scope_survives(spark):
    """A39: the oracle's GROUP BY keeps a NULL event_type group (the
    output even orders it NULLS FIRST), so the engine's joins on the
    group key must be null-SAFE — a plain equi-join would silently
    drop the NULL scope.  Pinned via the null-safe hash-key rendering
    (eqNullSafe compiles to coalesce(key,'')+isnull(key) join keys)."""
    plan = executed_plan(spark, "agg_kmv_quantiles", full=True)
    assert "isnull(event_type" in plan, plan
