"""Wave-9 semantics: the six decision-support shapes (Q4/Q7/Q8/Q9/
Q10/Q12), PSI drift, DSIR selection, token entropy, bounce rate, and
conversion lag — on crafted inputs where the right answer is computed
by hand.  Oracle parity (tests/test_parity.py) pins cross-engine
equality; these pin the SEMANTIC claims the docstrings make (strict
boundaries, once-per-order EXISTS, region-scoped denominators,
session attribution, importance-ratio direction).
"""

from __future__ import annotations

import hashlib
import math
import os
from datetime import datetime, timedelta

import pandas as pd
import pytest

from event_stream_checkout_spark.operators.events_analytics import (
    q_evt_bounce_rate,
    q_evt_conversion_lag,
)
from event_stream_checkout_spark.operators.llm_curate import (
    q_llm_dsir_sample,
    q_llm_token_entropy,
)
from event_stream_checkout_spark.operators.quality import q_dq_psi_drift
from event_stream_checkout_spark.operators.relational8 import (
    q_agg_market_share,
    q_agg_priority_late,
    q_agg_product_profit,
    q_agg_shipmode_priority,
    q_join_volume_shipping,
    q_topk_returned_customers,
)


def _write(tmp_path, name, pdf, sf="sfx"):
    sf_dir = str(tmp_path / sf)
    os.makedirs(sf_dir, exist_ok=True)
    for col in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[col]):
            pdf[col] = pdf[col].astype("datetime64[us]")
    pdf.to_parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return sf_dir


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


# ---------------------------------------------------------------------------
# A23 (Q4): EXISTS counts an order once; 45-day lateness is strict
# ---------------------------------------------------------------------------


def test_priority_late_counts_order_once_and_strict_boundary(spark, tmp_path):
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4],
            "o_orderdate": [
                _ts("1997-02-01"),  # in window, two late items -> once
                _ts("1997-03-01"),  # in window, boundary item -> out
                _ts("1996-12-31"),  # OUTSIDE window, late item -> out
                _ts("1997-04-01"),  # in window, one late item -> once
            ],
            "o_orderpriority": ["1-URGENT", "1-URGENT", "2-HIGH", "2-HIGH"],
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2, 2, 3, 4],
            "l_shipdate": [
                _ts("1997-05-01"),  # late (order 1)
                _ts("1997-06-01"),  # late again (must NOT double-count)
                _ts("1997-04-15"),  # exactly +45d: strict >, not late
                _ts("1997-03-10"),  # early
                _ts("1997-06-01"),  # late but order 3 out of window
                _ts("1997-06-01"),  # late (order 4, +61d)
            ],
        }
    )
    sf = _write(tmp_path, "orders", orders)
    _write(tmp_path, "lineitem", li)
    out = {
        r["o_orderpriority"]: r["n_orders"]
        for r in q_agg_priority_late(spark, sf).collect()
    }
    assert out == {"1-URGENT": 1, "2-HIGH": 1}


# ---------------------------------------------------------------------------
# J15 (Q7): both trade directions as separate groups; same-nation out
# ---------------------------------------------------------------------------


def test_volume_shipping_directions_and_window(spark, tmp_path):
    nation = pd.DataFrame(
        {"n_nationkey": [3, 7, 1], "n_name": ["NATION_3", "NATION_7", "NATION_1"]}
    )
    supplier = pd.DataFrame(
        {"s_suppkey": [1, 2, 3], "s_nationkey": [3, 7, 1]}
    )
    customer = pd.DataFrame(
        {"c_custkey": [1, 2, 3], "c_nationkey": [7, 3, 1]}
    )
    orders = pd.DataFrame({"o_orderkey": [1, 2, 3], "o_custkey": [1, 2, 3]})
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 2, 1, 3, 1],
            "l_suppkey": [1, 2, 2, 1, 1],
            "l_extendedprice": [100.0, 50.0, 70.0, 80.0, 90.0],
            "l_discount": [0.0, 0.0, 0.0, 0.0, 0.0],
            "l_shipdate": [
                _ts("1996-05-01"),  # N3 supp -> N7 cust: forward
                _ts("1997-05-01"),  # N7 supp -> N3 cust: reverse
                _ts("1996-06-01"),  # N7 supp -> N7 cust: same-nation, out
                _ts("1996-07-01"),  # N1 cust: out of pair
                _ts("1998-01-01"),  # window end is strict: out
            ],
        }
    )
    sf = _write(tmp_path, "nation", nation)
    _write(tmp_path, "supplier", supplier)
    _write(tmp_path, "customer", customer)
    _write(tmp_path, "orders", orders)
    _write(tmp_path, "lineitem", li)
    rows = [
        (r["supp_nation"], r["cust_nation"], r["l_year"], r["revenue"])
        for r in q_join_volume_shipping(spark, sf).collect()
    ]
    assert rows == [
        ("NATION_3", "NATION_7", 1996, 100.0),
        ("NATION_7", "NATION_3", 1997, 50.0),
    ]


# ---------------------------------------------------------------------------
# A24 (Q8): denominator is ALL in-region PROMO revenue, numerator one
# nation; out-of-region and off-type revenue never enter either side
# ---------------------------------------------------------------------------


def test_market_share_region_scoped_denominator(spark, tmp_path):
    region = pd.DataFrame({"r_regionkey": [0, 1], "r_name": ["ASIA", "EUROPE"]})
    nation = pd.DataFrame(
        {
            "n_nationkey": [5, 9, 2],
            "n_name": ["NATION_5", "NATION_9", "NATION_2"],
            "n_regionkey": [0, 0, 1],
        }
    )
    part = pd.DataFrame({"p_partkey": [1, 2], "p_type": ["PROMO", "OTHER"]})
    supplier = pd.DataFrame({"s_suppkey": [5, 9], "s_nationkey": [5, 9]})
    customer = pd.DataFrame({"c_custkey": [1, 2], "c_nationkey": [9, 2]})
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2],
            "o_custkey": [1, 2],
            "o_orderdate": [_ts("1997-03-01"), _ts("1997-04-01")],
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2, 1],
            "l_partkey": [1, 1, 1, 2],
            "l_suppkey": [5, 9, 5, 5],
            "l_extendedprice": [100.0, 300.0, 700.0, 900.0],
            "l_discount": [0.0, 0.0, 0.0, 0.0],
        }
    )
    sf = _write(tmp_path, "region", region)
    for n, df in [
        ("nation", nation), ("part", part), ("supplier", supplier),
        ("customer", customer), ("orders", orders), ("lineitem", li),
    ]:
        _write(tmp_path, n, df)
    rows = q_agg_market_share(spark, sf).collect()
    # NATION_5 sold 100 of the 400 PROMO revenue into ASIA; the 700
    # EUROPE sale and the 900 OTHER-type sale touch neither side.
    assert [(r["o_year"], r["mkt_share"]) for r in rows] == [(1997, 0.25)]


# ---------------------------------------------------------------------------
# A25 (Q9): profit mixes fact and dimension columns; LIKE prunes part
# ---------------------------------------------------------------------------


def test_product_profit_measure_and_name_filter(spark, tmp_path):
    nation = pd.DataFrame({"n_nationkey": [1], "n_name": ["NATION_1"]})
    supplier = pd.DataFrame({"s_suppkey": [1], "s_nationkey": [1]})
    part = pd.DataFrame(
        {
            "p_partkey": [1, 2],
            "p_name": ["warm red metal", "plain blue cloth"],
            "p_retailprice": [100.0, 100.0],
        }
    )
    orders = pd.DataFrame(
        {"o_orderkey": [1], "o_custkey": [1], "o_orderdate": [_ts("1997-03-01")]}
    )
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 1],
            "l_partkey": [1, 2],
            "l_suppkey": [1, 1],
            "l_quantity": [2.0, 2.0],
            "l_extendedprice": [200.0, 999.0],
            "l_discount": [0.0, 0.0],
        }
    )
    sf = _write(tmp_path, "nation", nation)
    for n, df in [
        ("supplier", supplier), ("part", part),
        ("orders", orders), ("lineitem", li),
    ]:
        _write(tmp_path, n, df)
    rows = q_agg_product_profit(spark, sf).collect()
    # Only the 'red' part survives: 200*(1-0) - 0.5*100*2 = 100.
    assert [(r["nation"], r["o_year"], r["profit"]) for r in rows] == [
        ("NATION_1", 1997, 100.0)
    ]


# ---------------------------------------------------------------------------
# O6 (Q10): only R lineitems of in-quarter orders; custkey breaks ties
# ---------------------------------------------------------------------------


def test_topk_returned_customers_flag_window_ties(spark, tmp_path):
    nation = pd.DataFrame({"n_nationkey": [1], "n_name": ["NATION_1"]})
    customer = pd.DataFrame(
        {
            "c_custkey": [1, 2, 3],
            "c_name": ["C1", "C2", "C3"],
            "c_nationkey": [1, 1, 1],
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4],
            "o_custkey": [1, 2, 3, 1],
            "o_orderdate": [
                _ts("1996-11-01"),
                _ts("1996-11-02"),
                _ts("1996-12-01"),
                _ts("1997-01-01"),  # boundary is strict <: out
            ],
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2, 3, 4],
            "l_returnflag": ["R", "N", "R", "R", "R"],
            "l_extendedprice": [100.0, 500.0, 100.0, 50.0, 999.0],
            "l_discount": [0.0, 0.0, 0.0, 0.0, 0.0],
        }
    )
    sf = _write(tmp_path, "nation", nation)
    for n, df in [("customer", customer), ("orders", orders), ("lineitem", li)]:
        _write(tmp_path, n, df)
    rows = [
        (r["c_custkey"], r["revenue"])
        for r in q_topk_returned_customers(spark, sf).collect()
    ]
    # c1 and c2 tie at 100 (the N item and the out-of-quarter order
    # never count) -> custkey ascending among ties, then c3.
    assert rows == [(1, 100.0), (2, 100.0), (3, 50.0)]


# ---------------------------------------------------------------------------
# A26 (Q12): +60d boundary is SLOW (>=); priorities partition counts
# ---------------------------------------------------------------------------


def test_shipmode_priority_boundary_and_counts(spark, tmp_path):
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2],
            "o_orderdate": [_ts("1997-01-01"), _ts("1997-01-01")],
            "o_orderpriority": ["1-URGENT", "3-MEDIUM"],
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2, 2, 2, 1],
            "l_shipdate": [
                _ts("1997-03-02"),  # exactly +60d -> SLOW, high
                _ts("1997-03-01"),  # +59d -> FAST, high
                _ts("1997-06-01"),  # SLOW, low
                _ts("1997-01-15"),  # FAST, low
                _ts("1997-02-01"),  # FAST, low
                _ts("1998-01-01"),  # out of ship window
            ],
        }
    )
    sf = _write(tmp_path, "orders", orders)
    _write(tmp_path, "lineitem", li)
    out = {
        r["ship_bucket"]: (r["high_line_count"], r["low_line_count"])
        for r in q_agg_shipmode_priority(spark, sf).collect()
    }
    assert out == {"FAST": (1, 2), "SLOW": (1, 1)}


# ---------------------------------------------------------------------------
# V5: PSI hand-computed on a 3-bin occupancy with NULL exclusion
# ---------------------------------------------------------------------------


def test_psi_drift_hand_computed(spark, tmp_path):
    pre, post = _ts("2001-01-01"), _ts("2001-07-01")
    orders = pd.DataFrame(
        {
            "o_orderkey": list(range(1, 10)),
            "o_orderdate": [pre] * 4 + [post] * 4 + [pre],
            "o_totalprice": [
                10_000.0, 10_000.0, 10_000.0, 120_000.0,  # pre: b0 x3, b2
                10_000.0, 480_000.0, 600_000.0, 490_000.0,  # post: b0, b9 x3
                None,  # NULL price: excluded on both engines
            ],
        }
    )
    sf = _write(tmp_path, "orders", orders)
    rows = q_dq_psi_drift(spark, sf).collect()
    assert [r["bin"] for r in rows] == [0, 2, 9]
    assert [(r["n_pre"], r["n_post"]) for r in rows] == [(3, 1), (1, 0), (0, 3)]
    # Replicate the quantization pipeline exactly.
    tp = tq = 4
    psi_acc = 0
    contribs = []
    for n_pre, n_post in [(3, 1), (1, 0), (0, 3)]:
        p = (n_pre + 1) / (tp + 10)
        q = (n_post + 1) / (tq + 10)
        lr = math.floor(math.log(p / q) * 1e6 + 0.5) / 1e6
        contrib = (p - q) * lr
        contribs.append(contrib)
        psi_acc += math.floor(contrib * 1e4 + 0.5)
    psi = psi_acc / 1e4
    for r, c in zip(rows, contribs):
        assert r["contrib"] == pytest.approx(c, abs=1e-6)
        assert r["psi"] == pytest.approx(psi, abs=1e-6)


# ---------------------------------------------------------------------------
# X47: entropy degenerate cases — constant doc 0, uniform doc ln k
# ---------------------------------------------------------------------------


def test_token_entropy_degenerate_and_ties(spark, tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["a a a a", "x y", "p q r s", "m m n n"],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
        }
    )
    sf = _write(tmp_path, "documents", docs)
    rows = [
        (r["doc_id"], r["n_toks"], r["entropy"])
        for r in q_llm_token_entropy(spark, sf).collect()
    ]
    ln2 = math.floor(math.log(2) * 1e6 + 0.5) / 1e6
    ln4 = math.floor(math.log(4) * 1e6 + 0.5) / 1e6
    # doc1 collapses to H=0; docs 2 and 4 tie at ln 2 (doc_id breaks
    # the tie); the uniform 4-token doc sits at ln 4.
    assert rows == [
        (1, 4, 0.0),
        (2, 2, pytest.approx(ln2, abs=1e-6)),
        (4, 4, pytest.approx(ln2, abs=1e-6)),
        (3, 4, pytest.approx(ln4, abs=1e-6)),
    ]


# ---------------------------------------------------------------------------
# X46: DSIR weights rank target-like docs above off-target docs
# ---------------------------------------------------------------------------


def _dsir_expected(docs: list[tuple[int, str, str]]) -> dict[int, float]:
    """Replicate the registered DSIR math (bucketed counts, add-1
    smoothing over 256 buckets, 1e-6 ln quantization, 1e-4 fixed-point
    per-doc sum) directly in Python."""
    bucket = lambda t: hashlib.md5(t.encode()).hexdigest()[:2]  # noqa: E731
    ct: dict[str, int] = {}
    cr: dict[str, int] = {}
    for _, text, lang in docs:
        for tok in text.split(" "):
            b = bucket(tok)
            cr[b] = cr.get(b, 0) + 1
            if lang == "en":
                ct[b] = ct.get(b, 0) + 1
    tt, tr = sum(ct.values()), sum(cr.values())
    out: dict[int, float] = {}
    for doc_id, text, _ in docs:
        tf: dict[str, int] = {}
        for tok in text.split(" "):
            b = bucket(tok)
            tf[b] = tf.get(b, 0) + 1
        acc = 0
        for b, f in tf.items():
            lr = (
                math.floor(
                    (
                        math.log((ct.get(b, 0) + 1) / (tt + 256))
                        - math.log((cr[b] + 1) / (tr + 256))
                    )
                    * 1e6
                    + 0.5
                )
                / 1e6
            )
            acc += f * math.floor(lr * 1e4 + 0.5)
        out[doc_id] = acc / 1e4
    return out


def test_dsir_prefers_target_distribution(spark, tmp_path):
    docs = [
        (1, "alpha beta alpha beta", "en"),
        (2, "alpha alpha beta beta", "en"),
        (3, "alpha beta alpha beta", "xx"),  # target-like tokens
        (4, "gamma delta gamma delta", "xx"),  # absent from target
        (5, "gamma gamma delta delta", "xx"),
    ]
    # The four tokens must land in distinct hash buckets or the
    # contrast collapses (deterministic: assert, don't hope).
    bs = {hashlib.md5(t.encode()).hexdigest()[:2]
          for t in ("alpha", "beta", "gamma", "delta")}
    assert len(bs) == 4
    pdf = pd.DataFrame(
        [(i, t, lg, "s") for i, t, lg in docs],
        columns=["doc_id", "text", "lang", "source"],
    )
    sf = _write(tmp_path, "documents", pdf)
    rows = {
        r["doc_id"]: (r["n_toks"], r["log_weight"])
        for r in q_llm_dsir_sample(spark, sf).collect()
    }
    exp = _dsir_expected(docs)
    assert set(rows) == set(exp)
    for doc_id, (n_toks, lw) in rows.items():
        assert n_toks == 4
        assert lw == pytest.approx(exp[doc_id], abs=1e-6)
    # The importance direction: a doc of target-frequent tokens must
    # outrank a doc of target-absent tokens.
    assert rows[3][1] > rows[4][1]


# ---------------------------------------------------------------------------
# E11: bounce rate — 30-min boundary inclusive, start-day attribution
# ---------------------------------------------------------------------------

_T0 = datetime(2024, 3, 1, 12, 0, 0)


def _write_events(tmp_path, rows):
    """rows: (event_id, seconds_after_T0, user_id, event_type)."""
    pdf = pd.DataFrame(
        [
            (eid, _T0 + timedelta(seconds=s), uid, et, 1.0, "{}")
            for eid, s, uid, et in rows
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    return _write(tmp_path, "events", pdf)


def test_bounce_rate_gap_boundary_and_day_attribution(spark, tmp_path):
    rows = [
        # u1: second event at EXACTLY +30min — strict >, same session.
        (1, 0, 1, "view"),
        (2, 1800, 1, "click"),
        # u2: singleton -> bounce.
        (3, 0, 2, "view"),
        # u3: +30min+1s -> TWO singleton sessions -> two bounces.
        (4, 0, 3, "view"),
        (5, 1801, 3, "view"),
        # u4: session straddles midnight -> attributed to its START day.
        (6, 11 * 3600 + 50 * 60, 4, "view"),   # 23:50 day 1
        (7, 12 * 3600 + 10 * 60, 4, "click"),  # 00:10 day 2, gap 20min
    ]
    out = q_evt_bounce_rate(spark, _write_events(tmp_path, rows)).collect()
    assert len(out) == 1  # nothing lands on day 2
    r = out[0]
    assert str(r["day"]) == "2024-03-01"
    assert (r["n_sessions"], r["n_bounced"]) == (5, 3)
    assert r["bounce_rate"] == 0.6


# ---------------------------------------------------------------------------
# E12: conversion lag — strict ordering, integer-second floor
# ---------------------------------------------------------------------------


def test_conversion_lag_strict_order_and_floor(spark, tmp_path):
    rows = [
        # u1: purchase 90.7s after first view -> lag floors to 90;
        # a later purchase must not shift the min.
        (1, 0, 1, "view"),
        (2, 0, 1, "purchase"),      # same instant: strict >, ignored
        (3, 500, 1, "purchase"),
        # u2: only purchase BEFORE the view -> excluded.
        (4, 100, 2, "view"),
        (5, 0, 2, "purchase"),
        # u3: view only -> excluded.
        (6, 0, 3, "view"),
        # u5: clean 10s conversion, same cohort day as u1.
        (7, 0, 5, "view"),
        (8, 10, 5, "purchase"),
    ]
    pdf = pd.DataFrame(
        [
            (eid, _T0 + timedelta(seconds=s), uid, et, 1.0, "{}")
            for eid, s, uid, et in rows
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    # Shift u1's first post-view purchase to +90.7s (sub-second part
    # must floor away, not round up).
    pdf.loc[pdf["event_id"] == 3, "ts"] = _T0 + timedelta(
        seconds=90, milliseconds=700
    )
    sf = _write(tmp_path, "events", pdf)
    out = q_evt_conversion_lag(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert str(r["cohort_day"]) == "2024-03-01"
    assert r["n_converted"] == 2
    assert (r["min_lag_s"], r["max_lag_s"]) == (10, 90)
    assert r["avg_lag_s"] == 50.0


# ---------------------------------------------------------------------------
# E13: Gini hand-computed — perfect equality 0, known concentration
# ---------------------------------------------------------------------------


def test_gini_hand_computed(spark, tmp_path):
    rows = []
    eid = 0
    # "view": per-user counts 4/2/1/1 -> G = (5*8 - 2*15)/(4*8) = 0.3125
    for uid, n in [(1, 4), (2, 2), (3, 1), (4, 1)]:
        for _ in range(n):
            eid += 1
            rows.append((eid, eid, uid, "view"))
    # "click": two users, two events each -> perfect equality, G = 0
    for uid, n in [(1, 2), (2, 2)]:
        for _ in range(n):
            eid += 1
            rows.append((eid, eid, uid, "click"))
    from event_stream_checkout_spark.operators.events_analytics import (
        q_evt_gini,
    )

    out = [
        (r["event_type"], r["n_users"], r["n_events"], r["gini"])
        for r in q_evt_gini(spark, _write_events(tmp_path, rows)).collect()
    ]
    assert out == [("click", 2, 4, 0.0), ("view", 4, 8, 0.3125)]


# ---------------------------------------------------------------------------
# X48: NB margin replica + classifier direction
# ---------------------------------------------------------------------------


def _nb_expected(docs: list[tuple[int, str, str]]) -> dict[int, float]:
    """Replicate the registered NB math (counted class-conditional
    bucket models, add-1 smoothing, 1e-6 ln quantization, 1e-4
    fixed-point per-doc sum, quantized prior) in Python."""
    bucket = lambda t: hashlib.md5(t.encode()).hexdigest()[:2]  # noqa: E731
    ce: dict[str, int] = {}
    cr: dict[str, int] = {}
    ne = 0
    for _, text, lang in docs:
        if lang == "en":
            ne += 1
        for tok in text.split(" "):
            b = bucket(tok)
            if lang == "en":
                ce[b] = ce.get(b, 0) + 1
            else:
                cr[b] = cr.get(b, 0) + 1
    te, tr, nd = sum(ce.values()), sum(cr.values()), len(docs)
    prior = (
        math.floor(
            (math.log((ne + 1) / (nd + 2)) - math.log((nd - ne + 1) / (nd + 2)))
            * 1e6
            + 0.5
        )
        / 1e6
    )
    out: dict[int, float] = {}
    for doc_id, text, _ in docs:
        tf: dict[str, int] = {}
        for tok in text.split(" "):
            b = bucket(tok)
            tf[b] = tf.get(b, 0) + 1
        acc = 0
        for b, f in tf.items():
            llr = (
                math.floor(
                    (
                        math.log((ce.get(b, 0) + 1) / (te + 256))
                        - math.log((cr.get(b, 0) + 1) / (tr + 256))
                    )
                    * 1e6
                    + 0.5
                )
                / 1e6
            )
            acc += f * math.floor(llr * 1e4 + 0.5)
        out[doc_id] = acc / 1e4 + prior
    return out


def test_nb_quality_filter_margin_and_direction(spark, tmp_path):
    docs = [
        (1, "alpha beta alpha beta", "en"),
        (2, "alpha alpha beta beta", "en"),
        (3, "alpha beta alpha beta", "xx"),  # target-like tokens
        (4, "gamma delta gamma delta", "xx"),  # rest-only tokens
        (5, "gamma gamma delta delta", "xx"),
    ]
    pdf = pd.DataFrame(
        [(i, t, lg, "s") for i, t, lg in docs],
        columns=["doc_id", "text", "lang", "source"],
    )
    sf = _write(tmp_path, "documents", pdf)
    from event_stream_checkout_spark.operators.llm_curate import (
        q_llm_nb_quality_filter,
    )

    rows = {
        r["doc_id"]: r["nb_margin"]
        for r in q_llm_nb_quality_filter(spark, sf).collect()
    }
    exp = _nb_expected(docs)
    assert set(rows) == set(exp)
    for doc_id, margin in rows.items():
        assert margin == pytest.approx(exp[doc_id], abs=1e-6)
    # Direction: English-token docs must outscore rest-only docs even
    # when their own label is 'xx' (the classifier scores CONTENT).
    assert rows[3] > rows[4]


# ---------------------------------------------------------------------------
# X49: cross-source span matrix — collapsed mass, short docs drop
# ---------------------------------------------------------------------------


def test_cross_source_dups_mass_and_short_doc_exclusion(spark, tmp_path):
    eight = "w1 w2 w3 w4 w5 w6 w7 w8"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                eight,                 # srcA: the shared span
                eight,                 # srcA again: n_A(g) = 2
                eight + " w9",         # srcB: shares [w1..w8], adds [w2..w9]
                "x1 x2 x3 x4 x5 x6 x7 x8",  # srcC: no overlap
                "short doc only",      # srcD: < 8 words, no spans
            ],
            "lang": ["en"] * 5,
            "source": ["srcA", "srcA", "srcB", "srcC", "srcD"],
        }
    )
    sf = _write(tmp_path, "documents", docs)
    from event_stream_checkout_spark.operators.llm_curate import (
        q_llm_cross_source_dups,
    )

    rows = [tuple(r) for r in q_llm_cross_source_dups(spark, sf).collect()]
    # One shared distinct gram; mass = n_A(g) * n_B(g) = 2 * 1.  srcC
    # and the sub-8-word srcD never pair with anyone.
    assert rows == [("srcA", "srcB", 1, 2)]


# ---------------------------------------------------------------------------
# A27: YoY growth — first-year NULL, previous OBSERVED year on gaps
# ---------------------------------------------------------------------------


def test_yoy_growth_first_year_null_and_gap_honesty(spark, tmp_path):
    from event_stream_checkout_spark.operators.relational8 import (
        q_agg_yoy_growth,
    )

    nation = pd.DataFrame({"n_nationkey": [1], "n_name": ["NATION_1"]})
    customer = pd.DataFrame({"c_custkey": [1], "c_nationkey": [1]})
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_custkey": [1, 1, 1],
            # 1997 has no orders: 1998's growth compares against 1996.
            "o_orderdate": [
                _ts("1996-05-01"),
                _ts("1996-08-01"),
                _ts("1998-05-01"),
            ],
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 2, 3],
            "l_extendedprice": [60.0, 40.0, 150.0],
            "l_discount": [0.0, 0.0, 0.0],
        }
    )
    sf = _write(tmp_path, "nation", nation)
    for n, df in [("customer", customer), ("orders", orders), ("lineitem", li)]:
        _write(tmp_path, n, df)
    rows = [
        (r["nation"], r["o_year"], r["revenue"], r["yoy_growth"])
        for r in q_agg_yoy_growth(spark, sf).collect()
    ]
    assert rows == [
        ("NATION_1", 1996, 100.0, None),
        ("NATION_1", 1998, 150.0, 0.5),
    ]


# ---------------------------------------------------------------------------
# X50: PCA — exact integer-protocol replica + measured convergence
# ---------------------------------------------------------------------------


def _write_embeddings(tmp_path, x32):
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = x32.shape[0]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [list(map(float, row)) for row in x32],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * n, pa.int32()),
        }
    )
    sf_dir = str(tmp_path / "sfx")
    os.makedirs(sf_dir, exist_ok=True)
    pq.write_table(tbl, os.path.join(sf_dir, "embeddings.parquet"))
    return sf_dir


def _pca_replica(x, iters=8, ss=1e7, sv=1e6):
    """Replicate the registered integer protocol bit-for-bit: quantized
    moments, 1e-6 covariance lattice, renormalized integer mat-vec."""
    import numpy as np

    n, d = x.shape
    s = [int(sum(math.floor(float(x[r, i]) * ss + 0.5) for r in range(n)))
         for i in range(d)]
    c = [[0] * d for _ in range(d)]
    for i in range(d):
        for j in range(d):
            p = sum(
                math.floor(float(x[r, i]) * float(x[r, j]) * ss + 0.5)
                for r in range(n)
            )
            c[i][j] = math.floor(
                ((p / ss - (s[i] / ss) * (s[j] / ss) / n) / n) * sv + 0.5
            )
    v = [int(sv)] * d
    for _ in range(iters):
        t = [sum(c[i][j] * v[j] for j in range(d)) for i in range(d)]
        mx = max(abs(ti) for ti in t)
        v = (
            [0] * d
            if mx == 0
            else [math.floor(ti / mx * sv + 0.5) for ti in t]
        )
    return [vi / sv for vi in v]


def _pca_fixture():
    import numpy as np

    rng = np.random.default_rng(7)
    u = rng.normal(size=64)
    u /= np.linalg.norm(u)
    t = rng.normal(size=40)
    x = np.outer(t, u) * 2.0 + rng.normal(size=(40, 64)) * 0.05
    return x.astype("float32"), u


def test_pca_matches_integer_replica(spark, tmp_path):
    import numpy as np

    x32, _ = _pca_fixture()
    sf = _write_embeddings(tmp_path, x32)
    from event_stream_checkout_spark.operators.clustering import (
        q_llm_embedding_pca,
    )

    rows = q_llm_embedding_pca(spark, sf).collect()
    got = [r["pc1"] for r in sorted(rows, key=lambda r: r["dim"])]
    want = _pca_replica(x32.astype("float64"))
    assert len(got) == 64
    for g, w in zip(got, want):
        assert g == pytest.approx(w, abs=1e-9)


def test_pca_converges_to_dominant_direction(spark, tmp_path):
    """The docstring promises convergence is MEASURED, not assumed: on
    a corpus with a planted dominant direction, 8 renormalized power
    steps align with numpy's top eigenvector of the same quantized
    covariance to |cos| >= 0.99."""
    import numpy as np

    x32, _ = _pca_fixture()
    sf = _write_embeddings(tmp_path, x32)
    from event_stream_checkout_spark.operators.clustering import (
        q_llm_embedding_pca,
    )

    pc1 = np.array(
        [
            r["pc1"]
            for r in sorted(
                q_llm_embedding_pca(spark, sf).collect(),
                key=lambda r: r["dim"],
            )
        ]
    )
    x = x32.astype("float64")
    n = x.shape[0]
    cq = np.zeros((64, 64))
    s = np.array(
        [sum(math.floor(v * 1e7 + 0.5) for v in x[:, i]) for i in range(64)]
    )
    for i in range(64):
        for j in range(64):
            p = sum(
                math.floor(x[r, i] * x[r, j] * 1e7 + 0.5) for r in range(n)
            )
            cq[i, j] = (
                math.floor(
                    ((p / 1e7 - (s[i] / 1e7) * (s[j] / 1e7) / n) / n) * 1e6
                    + 0.5
                )
                / 1e6
            )
    w, vecs = np.linalg.eigh(cq)
    top = vecs[:, np.argmax(w)]
    cos = abs(np.dot(pc1, top)) / (
        np.linalg.norm(pc1) * np.linalg.norm(top)
    )
    assert cos >= 0.99, f"power iteration misaligned: cos={cos}"


# ---------------------------------------------------------------------------
# V6: referential integrity — orphans counted as ROWS, NULLs excluded
# ---------------------------------------------------------------------------


def test_referential_integrity_orphans_and_nulls(spark, tmp_path):
    from event_stream_checkout_spark.operators.quality import (
        q_dq_referential_integrity,
    )

    region = pd.DataFrame({"r_regionkey": [0]})
    nation = pd.DataFrame({"n_nationkey": [1], "n_regionkey": [0]})
    customer = pd.DataFrame({"c_custkey": [1, 2], "c_nationkey": [1, 1]})
    # orders: one valid FK, TWO rows sharing one orphan key (must count
    # as 2 orphan ROWS, not 1 orphan key), one NULL (not an orphan).
    orders = pd.DataFrame(
        {"o_orderkey": [10, 11, 12, 13], "o_custkey": [1.0, 9.0, 9.0, None]}
    )
    orders["o_custkey"] = orders["o_custkey"].astype("Int64")
    part = pd.DataFrame({"p_partkey": [5]})
    supplier = pd.DataFrame({"s_suppkey": [6], "s_nationkey": [1]})
    li = pd.DataFrame(
        {"l_orderkey": [10], "l_partkey": [5], "l_suppkey": [6]}
    )
    sf = _write(tmp_path, "region", region)
    for n, df in [
        ("nation", nation), ("customer", customer), ("orders", orders),
        ("part", part), ("supplier", supplier), ("lineitem", li),
    ]:
        _write(tmp_path, n, df)
    rows = {
        r["fk"]: (r["n_rows"], r["n_null_keys"], r["n_orphans"], r["orphan_rate"])
        for r in q_dq_referential_integrity(spark, sf).collect()
    }
    assert rows["orders.o_custkey->customer.c_custkey"] == (
        4, 1, 2, pytest.approx(2 / 3, abs=1e-6),
    )
    # Every other edge is clean.
    for fk, (n, nn, orph, rate) in rows.items():
        if fk != "orders.o_custkey->customer.c_custkey":
            assert orph == 0 and (rate == 0.0 or rate is None), (fk, rows[fk])


# ---------------------------------------------------------------------------
# S19: JSONL round-trip — NULL lang survives, escaping keeps 1 line
# ---------------------------------------------------------------------------


def test_jsonl_roundtrip_null_lang_and_escaping(spark, tmp_path):
    from event_stream_checkout_spark.operators.relational8 import (
        q_src_jsonl_documents,
    )

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                'line one\nline "two" with, commas',  # escaping test
                "plain",
                "tabs\tand\\backslashes",
            ],
            "lang": ["en", None, "en"],  # NULL lang: dropped field on
            "source": ["s1", "s2", "s1"],  # write, NULL group on read
            "n_chars": [31, 5, 20],
        }
    )
    sf = _write(tmp_path, "documents", docs)
    rows = {
        r["lang"]: (r["n"], r["sum_chars"], r["max_doc_id"], r["n_corrupt"])
        for r in q_src_jsonl_documents(spark, sf).collect()
    }
    assert rows == {"en": (2, 51, 3, 0), None: (1, 5, 2, 0)}


# ---------------------------------------------------------------------------
# E14: cadence — ordinal pairing, integer-second floor, cap
# ---------------------------------------------------------------------------


def test_purchase_cadence_ordinals_and_floor(spark, tmp_path):
    from event_stream_checkout_spark.operators.events_analytics import (
        q_evt_purchase_cadence,
    )

    rows = [
        # u1: purchases at 0s, 100.9s, 400s -> gaps 100 (floored), 299
        (1, 0, 1, "purchase"),
        (3, 400, 1, "purchase"),
        (4, 50, 1, "view"),  # non-purchase: never enters the ordinal
        # u2: single purchase -> no transition
        (5, 0, 2, "purchase"),
        # u3: two purchases, gap 7s
        (6, 0, 3, "purchase"),
        (7, 7, 3, "purchase"),
    ]
    pdf = pd.DataFrame(
        [
            (eid, _T0 + timedelta(seconds=s), uid, et, 1.0, "{}")
            for eid, s, uid, et in rows
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    extra = pd.DataFrame(
        [(2, _T0 + timedelta(seconds=100, milliseconds=900), 1,
          "purchase", 1.0, "{}")],
        columns=pdf.columns,
    )
    sf = _write(tmp_path, "events", pd.concat([pdf, extra]))
    out = {
        r["ordinal"]: (r["n_users"], r["min_gap_s"], r["max_gap_s"], r["avg_gap_s"])
        for r in q_evt_purchase_cadence(spark, sf).collect()
    }
    # ordinal 1: u1 gap floor(100.9)=100, u3 gap 7 -> avg 53.5
    assert out[1] == (2, 7, 100, 53.5)
    # ordinal 2: only u1 (400 - 100.9 -> floor 299)
    assert out[2] == (1, 299, 299, 299.0)
    assert set(out) == {1, 2}


# ---------------------------------------------------------------------------
# E15: cumulative users — first-seen day attribution, running total
# ---------------------------------------------------------------------------


def test_cumulative_users_first_seen_attribution(spark, tmp_path):
    from event_stream_checkout_spark.operators.events_analytics import (
        q_evt_cumulative_users,
    )

    day = 86400
    rows = [
        (1, 0, 1, "view"),          # u1 first seen day 1
        (2, 2 * day, 1, "view"),    # u1 again day 3: NOT a new user
        (3, day, 2, "view"),        # u2 first seen day 2
        (4, day + 5, 3, "view"),    # u3 first seen day 2
        (5, 2 * day, 4, "view"),    # u4 first seen day 3
    ]
    out = [
        (str(r["day"]), r["new_users"], r["cum_users"])
        for r in q_evt_cumulative_users(
            spark, _write_events(tmp_path, rows)
        ).collect()
    ]
    assert out == [
        ("2024-03-01", 1, 1),
        ("2024-03-02", 2, 3),
        ("2024-03-03", 1, 4),
    ]


# ---------------------------------------------------------------------------
# V7: PK uniqueness — composite tuples, NULL-part exclusion, dup rows
# ---------------------------------------------------------------------------


def test_pk_uniqueness_composite_and_nulls(spark, tmp_path):
    from event_stream_checkout_spark.operators.quality import (
        q_dq_pk_uniqueness,
    )

    # lineitem: (1,1) twice -> 1 dup row; (1,2) distinct from (2,1)
    # (tuple semantics, not column-wise); one NULL linenumber row.
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 1, 2, 3],
            "l_linenumber": pd.array([1, 1, 2, 1, None], dtype="Int64"),
        }
    )
    orders = pd.DataFrame({"o_orderkey": [1, 1, 2]})  # 1 dup row
    for n, df in [
        ("lineitem", li), ("orders", orders),
        ("region", pd.DataFrame({"r_regionkey": [0]})),
        ("nation", pd.DataFrame({"n_nationkey": [0]})),
        ("customer", pd.DataFrame({"c_custkey": [0]})),
        ("supplier", pd.DataFrame({"s_suppkey": [0]})),
        ("part", pd.DataFrame({"p_partkey": [0]})),
        ("events", pd.DataFrame({"event_id": [0]})),
        ("documents", pd.DataFrame({"doc_id": [0]})),
        ("embeddings", pd.DataFrame({"vec_id": [0]})),
    ]:
        sf = _write(tmp_path, n, df)
    rows = {
        r["tbl"]: (r["n_rows"], r["n_null_keys"], r["n_dup_rows"], r["dup_rate"])
        for r in q_dq_pk_uniqueness(spark, sf).collect()
    }
    assert rows["lineitem"] == (5, 1, 1, pytest.approx(0.25, abs=1e-6))
    assert rows["orders"] == (3, 0, 1, pytest.approx(1 / 3, abs=1e-6))
    assert rows["region"] == (1, 0, 0, 0.0)


# ---------------------------------------------------------------------------
# X51: PCA projection — integer dot replica, |.| ordering
# ---------------------------------------------------------------------------


def test_pca_projection_matches_integer_replica(spark, tmp_path):
    import numpy as np

    x32, _ = _pca_fixture()
    sf = _write_embeddings(tmp_path, x32)
    from event_stream_checkout_spark.operators.clustering import (
        q_llm_pca_projection_topk,
    )

    rows = [
        (r["vec_id"], r["proj"])
        for r in q_llm_pca_projection_topk(spark, sf).collect()
    ]
    vec = [round(v * 1e6) for v in _pca_replica(x32.astype("float64"))]
    x = x32.astype("float64")
    proj = {
        i: sum(
            math.floor(x[i, j] * 1e6 + 0.5) * vec[j] for j in range(64)
        )
        for i in range(x.shape[0])
    }
    want = sorted(proj.items(), key=lambda kv: (-abs(kv[1]), kv[0]))[:25]
    assert [(i, pytest.approx(p / 1e12, abs=1e-6)) for i, p in want] == rows


# ---------------------------------------------------------------------------
# A28: revenue Gini — equality zero, known concentration, money units
# ---------------------------------------------------------------------------


def test_revenue_concentration_hand_computed(spark, tmp_path):
    from event_stream_checkout_spark.operators.relational8 import (
        q_agg_revenue_concentration,
    )

    nation = pd.DataFrame(
        {"n_nationkey": [1, 2], "n_name": ["EQ", "SKEW"]}
    )
    customer = pd.DataFrame(
        {"c_custkey": [1, 2, 3, 4], "c_nationkey": [1, 1, 2, 2]}
    )
    orders = pd.DataFrame(
        {"o_orderkey": [1, 2, 3, 4], "o_custkey": [1, 2, 3, 4]}
    )
    li = pd.DataFrame(
        {
            # EQ nation: both customers earn 100 -> G = 0.
            # SKEW nation: 300 vs 100 -> n=2, T=400, ranks 1,2 on DESC
            # -> S = 300 + 200 = 500; G = (3*400 - 1000)/(2*400) = 0.25
            "l_orderkey": [1, 2, 3, 4],
            "l_extendedprice": [100.0, 100.0, 300.0, 100.0],
            "l_discount": [0.0, 0.0, 0.0, 0.0],
        }
    )
    sf = _write(tmp_path, "nation", nation)
    for n, df in [("customer", customer), ("orders", orders), ("lineitem", li)]:
        _write(tmp_path, n, df)
    rows = {
        r["nation"]: (r["n_buyers"], r["revenue"], r["gini"])
        for r in q_agg_revenue_concentration(spark, sf).collect()
    }
    assert rows == {
        "EQ": (2, 200.0, 0.0),
        "SKEW": (2, 400.0, 0.25),
    }


# ---------------------------------------------------------------------------
# X52/X53: PCA deflation components + residual outliers (r10)
# ---------------------------------------------------------------------------


def _pca_multi_fixture():
    """3 planted orthogonal directions with separated strengths +
    small isotropic noise — the spectrum the deflation must walk."""
    import numpy as np

    rng = np.random.default_rng(11)
    basis, _ = np.linalg.qr(rng.normal(size=(64, 3)))
    t = rng.normal(size=(60, 3)) * np.array([3.0, 2.0, 1.0])
    x = t @ basis.T + rng.normal(size=(60, 64)) * 0.03
    return x.astype("float32"), basis


def test_pca_components_converge_to_top_eigenvectors(spark, tmp_path):
    """X52's docstring promises convergence is MEASURED: each deflated
    component aligns with numpy's corresponding eigenvector of the
    float covariance to |cos| >= 0.98 (deflation at 1e-3 direction
    precision leaves ~1e-6 leading-eigenvalue residue — far below the
    planted 3.0/2.0/1.0 separation)."""
    import numpy as np

    x32, _ = _pca_multi_fixture()
    sf = _write_embeddings(tmp_path, x32)
    from event_stream_checkout_spark.operators.clustering import (
        q_llm_pca_components,
    )

    rows = q_llm_pca_components(spark, sf).collect()
    comps = {}
    for r in rows:
        comps.setdefault(r["component"], [0.0] * 64)[r["dim"]] = r["val"]
    assert sorted(comps) == [0, 1, 2]
    x = x32.astype("float64")
    c = np.cov(x, rowvar=False, bias=True)
    w, vecs = np.linalg.eigh(c)
    top = vecs[:, np.argsort(w)[::-1][:3]]
    for k in range(3):
        v = np.array(comps[k])
        v = v / np.linalg.norm(v)
        cos = abs(float(v @ top[:, k]))
        assert cos >= 0.98, (k, cos)


def test_pca_moment_scan_memoized_across_consumers(spark, tmp_path):
    """ADVICE r9: the X51 projection re-ran the whole distributed
    moment pipeline.  Now every PCA consumer shares one collected
    matrix per (session, corpus) — the uncached path runs exactly
    once."""
    import event_stream_checkout_spark.operators.clustering as cl

    x32, _ = _pca_multi_fixture()
    sf = _write_embeddings(tmp_path, x32)
    calls = {"n": 0}
    real = cl._pca_moments_uncached

    def counting(spark_, sf_dir_):
        calls["n"] += 1
        return real(spark_, sf_dir_)

    cl._pca_moments_uncached = counting
    try:
        cl._PCA_MOMENT_CACHE.clear()
        cl.q_llm_embedding_pca(spark, sf).collect()
        cl.q_llm_pca_projection_topk(spark, sf).collect()
        cl.q_llm_pca_components(spark, sf).collect()
        cl.q_llm_pca_residual_topk(spark, sf).collect()
    finally:
        cl._pca_moments_uncached = real
    assert calls["n"] == 1, f"moment scan ran {calls['n']} times"


def test_pca_residual_flags_out_of_span_vectors(spark, tmp_path):
    """X53: vectors orthogonal to the learned 3-component basis carry
    ~all their norm as residual and must top the ranking over in-span
    vectors of comparable norm."""
    import numpy as np

    x32, basis = _pca_multi_fixture()
    rng = np.random.default_rng(23)
    q, _ = np.linalg.qr(
        np.concatenate([basis, rng.normal(size=(64, 3))], axis=1)
    )
    outliers = (q[:, 3:6] * 2.5).T  # rows 60, 61, 62: out-of-span
    x = np.concatenate([x32.astype("float64"), outliers]).astype(
        "float32"
    )
    sf = _write_embeddings(tmp_path, x)
    from event_stream_checkout_spark.operators.clustering import (
        q_llm_pca_residual_topk,
    )

    rows = q_llm_pca_residual_topk(spark, sf).collect()
    top3 = {r["vec_id"] for r in rows[:3]}
    assert top3 == {60, 61, 62}, top3
