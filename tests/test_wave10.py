"""Wave-10 semantics: containment vs Jaccard geometry, Count-Min
upper-bound + threshold, KL direction and zero-point, centroid
cosine geometry, exact percentile selection, cohort LTV arithmetic,
new-vs-returning split, and the reconciliation audit's three cases —
on crafted inputs where the right answer is computed by hand or by
an independent Python replication of the registered protocol.
Oracle parity (tests/test_parity.py) pins cross-engine equality;
these pin the SEMANTIC claims the docstrings make.
"""

from __future__ import annotations

import hashlib
import math
import os
from datetime import date, datetime, timedelta

import pandas as pd

from event_stream_checkout_spark.operators.events_analytics import (
    q_evt_cohort_ltv,
    q_evt_new_vs_returning,
    q_evt_session_duration,
)
from event_stream_checkout_spark.operators.llm_sketch import (
    q_llm_centroid_drift,
    q_llm_cm_heavy_hitters,
    q_llm_containment_pairs,
    q_llm_source_kl,
)
from event_stream_checkout_spark.operators.quality import (
    q_dq_order_reconciliation,
)


def _write(tmp_path, name, pdf, sf="sfx"):
    sf_dir = str(tmp_path / sf)
    os.makedirs(sf_dir, exist_ok=True)
    for col in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[col]):
            pdf[col] = pdf[col].astype("datetime64[us]")
    pdf.to_parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return sf_dir


def _docs(rows):
    return pd.DataFrame(
        [
            {
                "doc_id": i,
                "text": t,
                "lang": lang,
                "source": src,
                "n_chars": len(t),
            }
            for i, (t, lang, src) in enumerate(rows)
        ]
    )


# ---------------------------------------------------------------------------
# X54: containment catches the pasted-inside shape Jaccard dilutes away
# ---------------------------------------------------------------------------


def test_containment_catches_what_jaccard_misses(spark, tmp_path):
    short = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i}" for i in range(25))
    long_doc = short + " " + filler
    unrelated = "zeta eta theta iota kappa " + " ".join(
        f"u{i}" for i in range(25)
    )
    sf = _write(
        tmp_path,
        "documents",
        _docs(
            [
                (short, "en", "s0"),
                (long_doc, "en", "s0"),
                (unrelated, "en", "s1"),
            ]
        ),
    )
    got = {
        (r["doc_a"], r["doc_b"]): r for r in q_llm_containment_pairs(
            spark, sf
        ).collect()
    }
    # short (3 grams) fully inside long -> containment 1.0
    assert (0, 1) in got
    r = got[(0, 1)]
    assert r["n_common"] == 3 and r["n_a"] == 3
    assert abs(r["containment"] - 1.0) < 1e-9
    # Jaccard over the same pair is diluted below the X2 report floor
    jac = r["n_common"] / (r["n_a"] + r["n_b"] - r["n_common"])
    assert jac < 0.2
    # the unrelated doc pairs with nobody
    assert not any(2 in pair for pair in got)


# ---------------------------------------------------------------------------
# X55: Count-Min estimate is an upper bound; report = python replica
# ---------------------------------------------------------------------------


def _cm_reference(token_counts: dict[str, int]):
    depth, width_hex = 4, 2
    cells: dict[tuple[int, str], int] = {}

    def bucket(seed, tok):
        return hashlib.md5(f"{seed}:{tok}".encode()).hexdigest()[:width_hex]

    for tok, tf in token_counts.items():
        for s in range(depth):
            k = (s, bucket(s, tok))
            cells[k] = cells.get(k, 0) + tf
    total = sum(token_counts.values())
    out = {}
    for tok, tf in token_counts.items():
        est = min(cells[(s, bucket(s, tok))] for s in range(depth))
        if est * 100 >= total:
            out[tok] = (est, tf)
    return out


def test_cm_heavy_hitters_match_python_replica(spark, tmp_path):
    # 200 hot + 800 distinct cold tokens
    texts = []
    texts.append(" ".join(["hot"] * 200))
    for chunk in range(8):
        texts.append(
            " ".join(f"cold{chunk}_{i}" for i in range(100))
        )
    sf = _write(
        tmp_path,
        "documents",
        _docs([(t, "en", "s0") for t in texts]),
    )
    counts: dict[str, int] = {}
    for t in texts:
        for tok in t.split(" "):
            counts[tok] = counts.get(tok, 0) + 1
    want = _cm_reference(counts)
    got = {
        r["tok"]: (r["est"], r["tf"])
        for r in q_llm_cm_heavy_hitters(spark, sf).collect()
    }
    assert got == want
    assert "hot" in got
    for est, tf in got.values():
        assert est >= tf  # CM never undercounts


# ---------------------------------------------------------------------------
# X57: KL is ~0 for a proportional source, positive for a skewed one
# ---------------------------------------------------------------------------


def test_source_kl_zero_point_and_direction(spark, tmp_path):
    # two sources with IDENTICAL token distributions -> both KL ~ 0;
    # a third source of an exclusive token -> strongly positive.
    base = "a b c d " * 25
    sf = _write(
        tmp_path,
        "documents",
        _docs(
            [
                (base.strip(), "en", "same1"),
                (base.strip(), "en", "same2"),
                (" ".join(["rare"] * 100), "en", "skew"),
            ]
        ),
    )
    got = {r["source"]: r["kl_nats"] for r in q_llm_source_kl(
        spark, sf
    ).collect()}
    # identical-to-each-other sources still differ from the corpus
    # mixture (which includes 'rare'), but only by the mixture weight:
    # ln(300/200) for every token.  skew's exclusive token diverges by
    # ln(3) as well — all three equal here by construction.
    expect = round(math.floor(math.log(3 / 2) * 1e6 + 0.5) / 1e6, 6)
    assert abs(got["same1"] - expect) < 1e-6
    assert abs(got["same2"] - expect) < 1e-6
    assert got["skew"] > 0


def test_source_kl_single_source_is_zero(spark, tmp_path):
    sf = _write(
        tmp_path,
        "documents",
        _docs([("x y z x y x", "en", "only")]),
    )
    got = q_llm_source_kl(spark, sf).collect()
    assert len(got) == 1 and abs(got[0]["kl_nats"]) < 1e-9


# ---------------------------------------------------------------------------
# X56: centroid cosine on crafted orthogonal labels
# ---------------------------------------------------------------------------


def test_centroid_drift_geometry(spark, tmp_path):
    sf_dir = str(tmp_path / "sfx")
    os.makedirs(sf_dir, exist_ok=True)
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [1.0, 0.0], 0),
        (2, [0.0, 1.0], 1),
    ]
    pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]).to_parquet(
        f"{sf_dir}/embeddings.parquet"
    )
    got = {r["label"]: r for r in q_llm_centroid_drift(
        spark, sf_dir
    ).collect()}
    # label sums: l0=(2000,0), l1=(0,1000); global=(2000,1000)
    g = math.sqrt(2000**2 + 1000**2)
    assert abs(got[0]["cos_to_global"] - round(2000 * 2000 / (2000 * g), 6)) < 1e-9
    assert abs(got[1]["cos_to_global"] - round(1000 * 1000 / (1000 * g), 6)) < 1e-9
    assert abs(got[0]["centroid_norm"] - 1.0) < 1e-9
    assert abs(got[1]["centroid_norm"] - 1.0) < 1e-9
    assert got[0]["n_vecs"] == 2 and got[1]["n_vecs"] == 1


# ---------------------------------------------------------------------------
# E16: exact percentile rank selection
# ---------------------------------------------------------------------------


def test_session_duration_percentiles_exact(spark, tmp_path):
    # 10 users, one session each on the same day, durations 0..540 s
    t0 = datetime(2024, 5, 1, 12, 0, 0)
    rows = []
    eid = 0
    for u in range(10):
        dur = 60 * u
        rows.append((eid, t0, u, "view", 1.0, "{}")); eid += 1
        if dur:
            rows.append((eid, t0 + timedelta(seconds=dur), u, "view", 1.0, "{}"))
            eid += 1
    events = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf = _write(tmp_path, "events", events)
    got = q_evt_session_duration(spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_sessions"] == 10
    # sorted durations: 0,60,...,540; rank ceil(10q/100)
    assert r["p50_s"] == 240   # rank 5
    assert r["p90_s"] == 480   # rank 9
    assert r["p99_s"] == 540   # rank 10
    assert abs(r["mean_s"] - sum(60 * u for u in range(10)) / 10) < 1e-9


# ---------------------------------------------------------------------------
# E17: cohort LTV triangle arithmetic
# ---------------------------------------------------------------------------


def test_cohort_ltv_cumulative(spark, tmp_path):
    # week boundaries: epoch-day div 7 — pick d0 with epoch_day % 7 == 0
    d0 = date(1970, 1, 1) + timedelta(days=7 * 2800)  # still epoch-aligned
    t = lambda d, h=10: datetime(d.year, d.month, d.day, h)
    rows = [
        # u1: cohort week W, spends 10 at age 0, 5 at age 1
        (0, t(d0), 1, "purchase", 10.0, "{}"),
        (1, t(d0 + timedelta(days=7)), 1, "purchase", 5.0, "{}"),
        # u2: same cohort week (d0+3), spends 20 at age 0
        (2, t(d0 + timedelta(days=3)), 2, "purchase", 20.0, "{}"),
        # noise: non-purchase ignored
        (3, t(d0), 1, "view", 999.0, "{}"),
    ]
    events = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf = _write(tmp_path, "events", events)
    got = {
        (r["cohort_week"], r["age_w"]): r
        for r in q_evt_cohort_ltv(spark, sf).collect()
    }
    assert set(got) == {(d0, 0), (d0, 1)}
    a0, a1 = got[(d0, 0)], got[(d0, 1)]
    assert a0["n_users"] == 2 and a1["n_users"] == 2
    assert abs(a0["cum_rev"] - 30.0) < 1e-9
    assert abs(a1["cum_rev"] - 35.0) < 1e-9
    assert abs(a0["ltv_per_user"] - 15.0) < 1e-9
    assert abs(a1["ltv_per_user"] - 17.5) < 1e-9


# ---------------------------------------------------------------------------
# E18: the split is exact and exhaustive
# ---------------------------------------------------------------------------


def test_new_vs_returning_split(spark, tmp_path):
    d1 = datetime(2024, 5, 1, 9)
    d2 = datetime(2024, 5, 2, 9)
    rows = [
        (0, d1, 1, "view", 1.0, "{}"),
        (1, d1, 1, "click", 1.0, "{}"),  # same user+day: one active row
        (2, d1, 2, "view", 1.0, "{}"),
        (3, d2, 1, "view", 1.0, "{}"),   # returning
        (4, d2, 3, "view", 1.0, "{}"),   # new on day 2
    ]
    events = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf = _write(tmp_path, "events", events)
    got = {str(r["day"]): r for r in q_evt_new_vs_returning(
        spark, sf
    ).collect()}
    a, b = got["2024-05-01"], got["2024-05-02"]
    assert (a["n_active"], a["n_new"], a["n_returning"]) == (2, 2, 0)
    assert (b["n_active"], b["n_new"], b["n_returning"]) == (2, 1, 1)
    assert abs(b["new_share"] - 0.5) < 1e-9


# ---------------------------------------------------------------------------
# V8: exact header, drifted header, headerless — each lands in its bin
# ---------------------------------------------------------------------------


def test_order_reconciliation_three_cases(spark, tmp_path):
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_custkey": [1, 1, 1],
            "o_orderstatus": ["O", "O", "F"],
            "o_totalprice": [200.0, 300.0, 50.0],
            "o_orderdate": [datetime(2024, 1, 1)] * 3,
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    )
    lineitem = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2],
            "l_partkey": [1, 2, 3],
            "l_suppkey": [1, 1, 1],
            "l_linenumber": [1, 2, 1],
            "l_quantity": [1.0, 1.0, 1.0],
            "l_extendedprice": [100.0, 100.0, 100.0],
            "l_discount": [0.0, 0.0, 0.0],
            "l_tax": [0.0, 0.0, 0.0],
            "l_returnflag": ["N"] * 3,
            "l_linestatus": ["O"] * 3,
            "l_shipdate": [datetime(2024, 1, 5)] * 3,
        }
    )
    sf = _write(tmp_path, "orders", orders)
    _write(tmp_path, "lineitem", lineitem)
    got = {r["o_orderstatus"]: r for r in q_dq_order_reconciliation(
        spark, sf
    ).collect()}
    o, f = got["O"], got["F"]
    # order 1 reconciles exactly; order 2 drifts +200 (>1%)
    assert o["n_orders"] == 2 and o["n_no_lines"] == 0
    assert o["n_drift_gt_1pct"] == 1
    assert abs(o["max_abs_drift"] - 200.0) < 1e-9
    assert abs(o["net_drift"] - 200.0) < 1e-9
    # order 3 has no lines at all
    assert f["n_orders"] == 1 and f["n_no_lines"] == 1
    assert f["n_drift_gt_1pct"] == 0 and f["max_abs_drift"] is None
