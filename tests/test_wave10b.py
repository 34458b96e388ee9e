"""Wave-10b semantics: Q3 predicate/top-k geometry, Q5's
nation-equality join edge, Benford digit extraction from the
quantized integer, calendar-gap detection, churn-recency rollup,
engine-neutral weekday arithmetic, and exact decile arithmetic —
crafted inputs with hand-computed answers.  Oracle parity
(tests/test_parity.py) pins cross-engine equality; these pin the
SEMANTIC claims the docstrings make.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime, timedelta

import pandas as pd

from event_stream_checkout_spark.operators.events_analytics import (
    q_evt_churn_risk,
    q_evt_power_users,
    q_evt_traffic_profile,
)
from event_stream_checkout_spark.operators.quality import (
    q_dq_benford,
    q_dq_calendar_gaps,
)
from event_stream_checkout_spark.operators.relational9 import (
    q_agg_local_supplier_volume,
    q_join_shipping_priority,
)

EV_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _write(tmp_path, tables, sf="sfx"):
    sf_dir = str(tmp_path / sf)
    os.makedirs(sf_dir, exist_ok=True)
    for name, pdf in tables.items():
        pdf = pdf.copy()
        for col in pdf.columns:
            if pd.api.types.is_datetime64_any_dtype(pdf[col]):
                pdf[col] = pdf[col].astype("datetime64[us]")
        pdf.to_parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return sf_dir


# ---------------------------------------------------------------------------
# J16: Q3 shape — segment + both date predicates + exact top-k revenue
# ---------------------------------------------------------------------------


def test_shipping_priority_predicates_and_revenue(spark, tmp_path):
    anchor = datetime(1998, 6, 1)
    customer = pd.DataFrame(
        {
            "c_custkey": [1, 2],
            "c_name": ["a", "b"],
            "c_nationkey": [0, 0],
            "c_acctbal": [0.0, 0.0],
            "c_mktsegment": ["BUILDING", "MACHINERY"],
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": [10, 11, 12],
            "o_custkey": [1, 1, 2],
            "o_orderstatus": ["O"] * 3,
            "o_totalprice": [1.0] * 3,
            # 11 is AFTER the anchor (excluded); 12 is the wrong segment
            "o_orderdate": [
                anchor - timedelta(days=30),
                anchor + timedelta(days=1),
                anchor - timedelta(days=30),
            ],
            "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM"],
        }
    )
    lineitem = pd.DataFrame(
        {
            "l_orderkey": [10, 10, 10, 11, 12],
            "l_partkey": [1] * 5,
            "l_suppkey": [1] * 5,
            "l_linenumber": [1, 2, 3, 1, 1],
            "l_quantity": [1.0] * 5,
            "l_extendedprice": [100.0, 50.0, 999.0, 10.0, 10.0],
            "l_discount": [0.1, 0.0, 0.0, 0.0, 0.0],
            "l_tax": [0.0] * 5,
            "l_returnflag": ["N"] * 5,
            "l_linestatus": ["O"] * 5,
            # third line of order 10 shipped BEFORE the anchor: excluded
            "l_shipdate": [
                anchor + timedelta(days=5),
                anchor + timedelta(days=9),
                anchor - timedelta(days=5),
                anchor + timedelta(days=5),
                anchor + timedelta(days=5),
            ],
        }
    )
    sf = _write(
        tmp_path, {"customer": customer, "orders": orders, "lineitem": lineitem}
    )
    got = q_join_shipping_priority(spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    assert r["l_orderkey"] == 10
    assert r["o_orderpriority"] == "1-URGENT"
    # 100*(1-0.1) + 50 = 140; the pre-anchor line never contributes
    assert abs(r["revenue"] - 140.0) < 1e-9


# ---------------------------------------------------------------------------
# A29: Q5 shape — the c_nationkey = s_nationkey edge is a JOIN condition
# ---------------------------------------------------------------------------


def test_local_supplier_volume_nation_edge(spark, tmp_path):
    region = pd.DataFrame(
        {"r_regionkey": [0, 1], "r_name": ["ASIA", "EUROPE"]}
    )
    nation = pd.DataFrame(
        {
            "n_nationkey": [1, 2],
            "n_name": ["N_ASIA", "N_EUR"],
            "n_regionkey": [0, 1],
        }
    )
    supplier = pd.DataFrame(
        {
            "s_suppkey": [100, 200],
            "s_name": ["s1", "s2"],
            "s_nationkey": [1, 2],
            "s_acctbal": [0.0, 0.0],
        }
    )
    customer = pd.DataFrame(
        {
            "c_custkey": [1, 2],
            "c_name": ["a", "b"],
            "c_nationkey": [1, 2],
            "c_acctbal": [0.0, 0.0],
            "c_mktsegment": ["BUILDING"] * 2,
        }
    )
    d96 = datetime(1996, 5, 1)
    orders = pd.DataFrame(
        {
            "o_orderkey": [10, 20],
            "o_custkey": [1, 2],
            "o_orderstatus": ["O", "O"],
            "o_totalprice": [1.0, 1.0],
            "o_orderdate": [d96, d96],
            "o_orderpriority": ["1-URGENT"] * 2,
        }
    )
    lineitem = pd.DataFrame(
        {
            # o10/c1(N1): line via s1(N1) counts, line via s2(N2) doesn't;
            # o20/c2(N2): line via s1(N1) fails BOTH the nation edge and
            # the region prune — never reaches the aggregate.
            "l_orderkey": [10, 10, 20],
            "l_partkey": [1] * 3,
            "l_suppkey": [100, 200, 100],
            "l_linenumber": [1, 2, 1],
            "l_quantity": [1.0] * 3,
            "l_extendedprice": [100.0, 77.0, 55.0],
            "l_discount": [0.1, 0.0, 0.0],
            "l_tax": [0.0] * 3,
            "l_returnflag": ["N"] * 3,
            "l_linestatus": ["O"] * 3,
            "l_shipdate": [d96] * 3,
        }
    )
    sf = _write(
        tmp_path,
        {
            "region": region,
            "nation": nation,
            "supplier": supplier,
            "customer": customer,
            "orders": orders,
            "lineitem": lineitem,
        },
    )
    got = q_agg_local_supplier_volume(spark, sf).collect()
    assert len(got) == 1
    assert got[0]["n_name"] == "N_ASIA"
    assert abs(got[0]["revenue"] - 90.0) < 1e-9


# ---------------------------------------------------------------------------
# V9: first digit comes from the quantized integer, not double formatting
# ---------------------------------------------------------------------------


def test_benford_digit_extraction(spark, tmp_path):
    # quantized: 10000, 100000, 199900, 20000, 250000, 3000000
    # first digits: 1, 1, 1, 2, 2, 3
    orders = pd.DataFrame(
        {
            "o_orderkey": list(range(6)),
            "o_custkey": [1] * 6,
            "o_orderstatus": ["O"] * 6,
            "o_totalprice": [1.0, 10.0, 19.99, 2.0, 25.0, 300.0],
            "o_orderdate": [datetime(2024, 1, 1)] * 6,
            "o_orderpriority": ["1-URGENT"] * 6,
        }
    )
    sf = _write(tmp_path, {"orders": orders})
    got = {r["digit"]: r for r in q_dq_benford(spark, sf).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["n"] == 3 and got[2]["n"] == 2 and got[3]["n"] == 1
    assert abs(got[1]["obs_share"] - 0.5) < 1e-9
    assert abs(got[1]["benford_share"] - round(math.log10(2.0), 6)) < 1e-12
    # chi2 term for digit 1: (3 - 6*log10(2))^2 / (6*log10(2))
    e1 = 6 * math.log10(2.0)
    assert abs(got[1]["chi2_term"] - round((3 - e1) ** 2 / e1, 6)) < 1e-9
    assert all(r["chi2_term"] >= 0 for r in got.values())


# ---------------------------------------------------------------------------
# V10: gap arithmetic — missing days and the longest silent run
# ---------------------------------------------------------------------------


def test_calendar_gaps_span_and_max_gap(spark, tmp_path):
    d = lambda off, h=9: datetime(2024, 3, 1 + off, h)
    events = pd.DataFrame(
        # days 1, 2, 5 of March: missing 3-4 → missing=2, max_gap=2
        [(i, ts, 1, "view", 1.0, "{}") for i, ts in enumerate(
            [d(0), d(0, 15), d(1), d(4)]
        )],
        columns=EV_COLS,
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2],
            "o_custkey": [1, 1],
            "o_orderstatus": ["O"] * 2,
            "o_totalprice": [1.0] * 2,
            "o_orderdate": [datetime(2024, 4, 1), datetime(2024, 4, 2)],
            "o_orderpriority": ["1-URGENT"] * 2,
        }
    )
    sf = _write(tmp_path, {"events": events, "orders": orders})
    got = {r["table_name"]: r for r in q_dq_calendar_gaps(spark, sf).collect()}
    ev = got["events"]
    assert ev["first_day"] == date(2024, 3, 1)
    assert ev["last_day"] == date(2024, 3, 5)
    assert (ev["span_days"], ev["present_days"]) == (5, 3)
    assert (ev["missing_days"], ev["max_gap_days"]) == (2, 2)
    od = got["orders"]
    assert (od["span_days"], od["missing_days"], od["max_gap_days"]) == (2, 0, 0)


# ---------------------------------------------------------------------------
# E19: recency rollup against the corpus watermark
# ---------------------------------------------------------------------------


def test_churn_risk_recency_buckets(spark, tmp_path):
    d = lambda off, h=9: datetime(2024, 5, 10 + off, h)
    rows = [
        (0, d(0), 1, "view", 1.0, "{}"),    # u1 last seen at watermark
        (1, d(-7), 1, "view", 1.0, "{}"),   # earlier event ignored by MAX
        (2, d(0), 2, "view", 1.0, "{}"),    # u2 at watermark
        (3, d(-3), 3, "view", 1.0, "{}"),   # u3 three days silent
    ]
    sf = _write(tmp_path, {"events": pd.DataFrame(rows, columns=EV_COLS)})
    got = {r["days_inactive"]: r for r in q_evt_churn_risk(spark, sf).collect()}
    assert set(got) == {0, 3}
    assert got[0]["n_users"] == 2 and got[3]["n_users"] == 1
    assert got[0]["cum_users"] == 2 and got[3]["cum_users"] == 3
    assert abs(got[3]["cum_share"] - 1.0) < 1e-9
    assert abs(got[0]["user_share"] - round(2 / 3, 6)) < 1e-9


# ---------------------------------------------------------------------------
# E20: weekday arithmetic is epoch-based (1970-01-01 → Thursday = ISO 4)
# ---------------------------------------------------------------------------


def test_traffic_profile_weekday_and_share(spark, tmp_path):
    rows = [
        (0, datetime(1970, 1, 1, 5), 1, "view", 1.0, "{}"),   # Thu 05
        (1, datetime(1970, 1, 1, 5), 2, "view", 1.0, "{}"),   # Thu 05
        (2, datetime(1970, 1, 1, 7), 1, "view", 1.0, "{}"),   # Thu 07
        (3, datetime(1970, 1, 5, 23), 1, "view", 1.0, "{}"),  # Mon 23
    ]
    sf = _write(tmp_path, {"events": pd.DataFrame(rows, columns=EV_COLS)})
    got = {(r["dow"], r["hr"]): r for r in q_evt_traffic_profile(
        spark, sf
    ).collect()}
    assert set(got) == {(4, 5), (4, 7), (1, 23)}
    assert got[(4, 5)]["n"] == 2
    assert abs(got[(4, 5)]["dow_share"] - round(2 / 3, 6)) < 1e-9
    assert abs(got[(1, 23)]["dow_share"] - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# E21: exact decile arithmetic on the two-pass rank
# ---------------------------------------------------------------------------


def test_power_users_exact_deciles(spark, tmp_path):
    # 10 users with 10, 9, ..., 1 events → one user per decile,
    # decile 0 = the 10-event user; total 55 events.
    rows = []
    eid = 0
    for u in range(10):
        for _ in range(10 - u):
            rows.append((eid, datetime(2024, 5, 1, 9), u, "view", 1.0, "{}"))
            eid += 1
    sf = _write(tmp_path, {"events": pd.DataFrame(rows, columns=EV_COLS)})
    got = q_evt_power_users(spark, sf).collect()
    assert [r["decile"] for r in got] == list(range(10))
    assert all(r["n_users"] == 1 for r in got)
    assert [r["events"] for r in got] == list(range(10, 0, -1))
    assert abs(got[0]["event_share"] - round(10 / 55, 6)) < 1e-9
    assert abs(got[-1]["cum_event_share"] - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# X58: identical docs calibrate to est = exact = 1, err = 0
# ---------------------------------------------------------------------------


def test_minhash_calibration_identical_pair(spark, tmp_path):
    from event_stream_checkout_spark.operators.llm_curate import (
        q_llm_minhash_calibration,
    )

    text = "the quick brown fox jumps over the lazy dog tonight"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [text, text, "completely different words entirely here"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [len(text)] * 2 + [40],
        }
    )
    sf = _write(tmp_path, {"documents": docs})
    got = q_llm_minhash_calibration(spark, sf).collect()
    # Only the identical pair is a banding candidate: all 8 components
    # agree, exact Jaccard is 1, and the estimator error is 0.
    assert len(got) == 1
    r = got[0]
    assert r["n_match"] == 8
    assert abs(r["est_jaccard"] - 1.0) < 1e-12
    assert r["n_pairs"] == 1
    assert abs(r["mean_exact"] - 1.0) < 1e-9
    assert abs(r["mean_abs_err"]) < 1e-9


# ---------------------------------------------------------------------------
# X59: IVF-PQ composition returns same-blob neighbors end to end
# ---------------------------------------------------------------------------


def test_ivfpq_topk_same_blob(spark, tmp_path):
    """Two far-apart blobs; the query sits at blob A's center.  The
    coarse probe must select A-side cells, the ADC pass must
    shortlist A members, and the exact rerank's top-10 must all be
    blob-A vectors (seeds 1-3 and members 8-17) — never blob B."""
    from event_stream_checkout_spark.operators.clustering import (
        q_llm_ivfpq_topk,
    )

    rows = [(0, [0.0, 0.0, 0.0, 0.0])]  # query + coarse seed 0
    # coarse seeds 1..7: three in blob A, four in blob B
    for i in range(1, 4):
        rows.append((i, [float(i), 0.0, 0.0, 0.0]))
    for i in range(4, 8):
        rows.append((i, [1000.0 + i, 1000.0, 1000.0, 1000.0]))
    # members: 10 in A (8..17), 10 in B (18..27)
    for i in range(8, 18):
        rows.append((i, [float(i - 8), 1.0, 0.0, 1.0]))
    for i in range(18, 28):
        rows.append((i, [1000.0 + (i - 18), 1001.0, 1000.0, 1001.0]))
    a_side = set(range(1, 4)) | set(range(8, 18))
    sf = _write(
        tmp_path,
        {"embeddings": pd.DataFrame(rows, columns=["vec_id", "embedding"])},
    )
    got = [r["vec_id"] for r in q_llm_ivfpq_topk(spark, sf).collect()]
    # nprobe=2 of 8 cells bounds how much of blob A is reachable (IVF
    # recall theory); what the COMPOSITION must guarantee is that
    # nothing outside the probed blob ever surfaces and the nearest
    # in-cell vector ranks first.
    assert 1 <= len(got) <= 10
    assert set(got) <= a_side, got
    # nearest crafted vector to the origin-query is seed 1 at dist 1
    assert got[0] == 1


# ---------------------------------------------------------------------------
# V11: exact quartile selection, Tukey fences, outlier counts
# ---------------------------------------------------------------------------


def test_outlier_iqr_exact_quartiles(spark, tmp_path):
    from event_stream_checkout_spark.operators.quality import q_dq_outlier_iqr

    # events.value = 1..8 plus one 100.0 outlier: n=9, q1 = value at
    # rank ceil(9/4)=3 -> 3.0, q3 at rank ceil(27/4)=7 -> 7.0, fences
    # [-3, 13] -> exactly one high outlier.
    ev = pd.DataFrame(
        [(i, datetime(2024, 5, 1, 9), 1, "view", float(v), "{}")
         for i, v in enumerate(list(range(1, 9)) + [100])],
        columns=EV_COLS,
    )
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 1], "l_partkey": [1, 2], "l_suppkey": [1, 1],
            "l_linenumber": [1, 2], "l_quantity": [1.0, 2.0],
            "l_extendedprice": [10.0, 20.0], "l_discount": [0.0, 0.0],
            "l_tax": [0.0, 0.0], "l_returnflag": ["N", "N"],
            "l_linestatus": ["O", "O"],
            "l_shipdate": [datetime(2024, 1, 1)] * 2,
        }
    )
    od = pd.DataFrame(
        {
            "o_orderkey": [1, 2], "o_custkey": [1, 1],
            "o_orderstatus": ["O", "O"], "o_totalprice": [10.0, 20.0],
            "o_orderdate": [datetime(2024, 1, 1)] * 2,
            "o_orderpriority": ["1-URGENT"] * 2,
        }
    )
    sf = _write(tmp_path, {"events": ev, "lineitem": li, "orders": od})
    got = {
        (r["table_name"], r["column_name"]): r
        for r in q_dq_outlier_iqr(spark, sf).collect()
    }
    r = got[("events", "value")]
    assert r["n"] == 9
    assert r["q1"] == 3.0 and r["q3"] == 7.0
    assert r["iqr"] == 4.0
    assert (r["n_below"], r["n_above"]) == (0, 1)
    assert abs(r["outlier_rate"] - round(1 / 9, 6)) < 1e-9


# ---------------------------------------------------------------------------
# V12: a dark field is counted, complete fields are zero
# ---------------------------------------------------------------------------


def test_null_profile_counts_dark_field(spark, tmp_path):
    from event_stream_checkout_spark.operators.quality import q_dq_null_profile

    tables = {
        "customer": pd.DataFrame(
            {"c_custkey": [1], "c_name": ["a"], "c_nationkey": [0],
             "c_acctbal": [0.0], "c_mktsegment": ["BUILDING"]}
        ),
        "documents": pd.DataFrame(
            {"doc_id": [1], "text": ["hello world now"], "lang": ["en"],
             "source": ["s"], "n_chars": [15]}
        ),
        "embeddings": pd.DataFrame(
            {"vec_id": [0], "embedding": [[0.0, 1.0]], "label": ["a"]}
        ),
        "events": pd.DataFrame(
            [(0, datetime(2024, 5, 1, 9), 1, "view", 1.0, "{}")],
            columns=EV_COLS,
        ),
        "lineitem": pd.DataFrame(
            {"l_orderkey": [1], "l_partkey": [1], "l_suppkey": [1],
             "l_linenumber": [1], "l_quantity": [1.0],
             "l_extendedprice": [1.0], "l_discount": [0.0], "l_tax": [0.0],
             "l_returnflag": ["N"], "l_linestatus": ["O"],
             "l_shipdate": [datetime(2024, 1, 1)]}
        ),
        "orders": pd.DataFrame(
            {"o_orderkey": [1, 2, 3, 4],
             "o_custkey": pd.array([1, None, 1, 1], dtype="Int64"),
             "o_orderstatus": ["O"] * 4, "o_totalprice": [1.0] * 4,
             "o_orderdate": [datetime(2024, 1, 1)] * 4,
             "o_orderpriority": ["1-URGENT"] * 4}
        ),
        "part": pd.DataFrame(
            {"p_partkey": [1], "p_name": ["p"], "p_brand": ["b"],
             "p_type": ["t"], "p_size": [1], "p_retailprice": [1.0]}
        ),
        "supplier": pd.DataFrame(
            {"s_suppkey": [1], "s_name": ["s"], "s_nationkey": [0],
             "s_acctbal": [0.0]}
        ),
    }
    sf = _write(tmp_path, tables)
    got = {
        (r["table_name"], r["column_name"]): r
        for r in q_dq_null_profile(spark, sf).collect()
    }
    assert len(got) == 46
    dark = got[("orders", "o_custkey")]
    assert (dark["n_rows"], dark["n_null"]) == (4, 1)
    assert abs(dark["null_rate"] - 0.25) < 1e-9
    assert got[("orders", "o_orderkey")]["n_null"] == 0
    assert got[("events", "value")]["n_null"] == 0


# ---------------------------------------------------------------------------
# E22: the seasonal baseline separates what a per-series mean cannot
# ---------------------------------------------------------------------------


def test_anomaly_seasonal_flags_against_cell_baseline(spark, tmp_path):
    from event_stream_checkout_spark.operators.events_analytics import (
        q_evt_anomaly_seasonal,
    )

    # Seven Mondays at 09:00 with counts 10×6 then 40: the 40 is
    # z = (40 - 100/7) / sqrt((2200 - 100²/7)/6) ≈ 2.268 > 2 against
    # its OWN (Mon, 09) cell — flagged.  One Sunday 03:00 hour with
    # the SAME raw count 40 but n=1 — no baseline, z NULL, never
    # flagged.  A per-series mean would treat both identically.
    rows = []
    eid = 0
    for wk in range(7):
        ts = datetime(2024, 5, 6, 9) + timedelta(days=7 * wk)
        for _ in range(10 if wk < 6 else 40):
            rows.append((eid, ts, 1, "view", 1.0, "{}")); eid += 1
    for _ in range(40):
        rows.append((eid, datetime(2024, 5, 5, 3), 1, "view", 1.0, "{}"))
        eid += 1
    sf = _write(tmp_path, {"events": pd.DataFrame(rows, columns=EV_COLS)})
    got = q_evt_anomaly_seasonal(spark, sf).collect()
    by_key = {(r["dow"], r["hr"], r["cnt"]): r for r in got}
    hot = by_key[(1, 9, 40)]           # Monday=ISO 1, 09:00 spike
    assert hot["n"] == 7 and hot["is_anomaly"]
    mu = 100 / 7
    sd = math.sqrt((2200 - 100 * 100 / 7) / 6)
    assert abs(hot["z"] - round((40 - mu) / sd, 6)) < 1e-9
    low = by_key[(1, 9, 10)]
    assert not low["is_anomaly"]
    quiet = by_key[(7, 3, 40)]         # Sunday=ISO 7, 03:00, n=1
    assert quiet["n"] == 1 and quiet["z"] is None
    assert not quiet["is_anomaly"]


# ---------------------------------------------------------------------------
# X61: an appended vector that is the true NN must surface in the probe
# ---------------------------------------------------------------------------


def test_ivfpq_append_surfaces_new_nearest(spark, tmp_path):
    from event_stream_checkout_spark.operators.clustering import (
        q_llm_ivfpq_index_append,
    )

    # Base: query at origin + seeds/members in blob A (near origin)
    # and blob B (far).  vec_id 19 (mod 10 == 9) is the ARRIVING
    # batch: placed closer to the query than any base vector.  After
    # the append it must be the probe's top-1; day-1-only indexing
    # would never return it.
    rows = [(0, [0.0, 0.0, 0.0, 0.0])]
    for i in range(1, 4):                      # blob A base members
        rows.append((i, [float(i + 1), 0.0, 0.0, 0.0]))
    for i in range(4, 8):                      # blob B seeds
        rows.append((i, [1000.0 + i, 1000.0, 1000.0, 1000.0]))
    for i in range(8, 18):
        if i % 10 == 9:
            continue
        rows.append((i, [float(i - 4), 1.0, 0.0, 1.0]))  # blob A spread
    rows.append((19, [0.5, 0.0, 0.0, 0.0]))    # the batch vector: NN
    sf = _write(
        tmp_path,
        {"embeddings": pd.DataFrame(rows, columns=["vec_id", "embedding"])},
    )
    got = [r["vec_id"] for r in q_llm_ivfpq_index_append(spark, sf).collect()]
    assert got, "probe returned nothing"
    assert got[0] == 19, got
    assert 19 in got and all(g not in range(4, 8) for g in got)


# ---------------------------------------------------------------------------
# V9b: absent digits still contribute expected mass; verdict is exact
# ---------------------------------------------------------------------------


def test_benford_decision_counts_absent_digits(spark, tmp_path):
    from event_stream_checkout_spark.operators.quality import (
        q_dq_benford_decision,
    )

    # All six prices lead with digit 9 — the LEAST Benford-likely
    # digit (p≈0.046), so the d=9 term alone is ~119 and the eight
    # absent categories add their full N·p expected mass: χ² ≈ 125,
    # the 1% gate rejects.  (Six digit-1 values would NOT reject —
    # χ² ≈ 13.9 < 20.09 — leading digit 1 is the Benford mode.)
    # Replicated independently in python with the identical
    # quantize-then-sum protocol.
    orders = pd.DataFrame(
        {
            "o_orderkey": list(range(6)),
            "o_custkey": [1] * 6,
            "o_orderstatus": ["O"] * 6,
            "o_totalprice": [9.0, 90.0, 99.0, 900.0, 950.0, 9999.0],
            "o_orderdate": [datetime(2024, 1, 1)] * 6,
            "o_orderpriority": ["1-URGENT"] * 6,
        }
    )
    sf = _write(tmp_path, {"orders": orders})
    got = q_dq_benford_decision(spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    n = 6
    total_q = 0
    for d in range(1, 10):
        p = math.log10(1.0 + 1.0 / d)
        obs = n if d == 9 else 0
        term = (obs - n * p) ** 2 / (n * p)
        total_q += math.floor(term * 10000.0 + 0.5)
    assert abs(r["chi2_total"] - round(total_q / 10000.0, 4)) < 1e-9
    assert r["df"] == 8
    assert bool(r["reject"]) is True


# ---------------------------------------------------------------------------
# X62: probe is served by the stored sketches; dilution can't hide a hitter
# ---------------------------------------------------------------------------


def test_cm_persisted_candidates_and_merge(spark, tmp_path):
    from event_stream_checkout_spark.operators.llm_sketch import (
        q_llm_cm_sketch_persisted,
    )

    # Source A: 'hot' is 10 of 20 tokens (50% share) -> stored as an
    # A-candidate, union share 10/120 ≈ 8.3% -> must be reported with
    # est >= exact 10 (Count-Min estimates are upper bounds).
    # 'fill' tokens are unique -> no other candidate crosses 1% of the
    # 120-token union except B's repeated 'beta' (40/120 = 33%).
    docs = []
    a_text = " ".join(["hot"] * 10 + [f"fa{i}" for i in range(10)])
    b_text = " ".join(["beta"] * 40 + [f"fb{i}" for i in range(60)])
    docs.append({"doc_id": 1, "text": a_text, "lang": "en",
                 "source": "A", "n_chars": len(a_text)})
    docs.append({"doc_id": 2, "text": b_text, "lang": "en",
                 "source": "B", "n_chars": len(b_text)})
    sf = _write(tmp_path, {"documents": pd.DataFrame(docs)})
    got = {r["tok"]: r for r in q_llm_cm_sketch_persisted(spark, sf).collect()}
    assert "hot" in got and "beta" in got
    assert got["hot"]["est"] >= 10       # upper bound of the exact 10
    assert got["beta"]["est"] >= 40
    assert got["hot"]["n_candidate_sources"] == 1
    # every reported token clears the integer threshold est*100 >= 120
    assert all(r["est"] * 100 >= 120 for r in got.values())


# ---------------------------------------------------------------------------
# E23: hand-computed KM curve with censoring
# ---------------------------------------------------------------------------


def test_survival_km_hand_curve(spark, tmp_path):
    from event_stream_checkout_spark.operators.events_analytics import (
        q_evt_survival_km,
    )

    d = lambda off, h=9: datetime(2024, 4, 1 + off, h)
    rows = []
    eid = 0
    def span(u, first, last):
        nonlocal eid
        rows.append((eid, d(first), u, "view", 1.0, "{}")); eid += 1
        if last != first:
            rows.append((eid, d(last), u, "view", 1.0, "{}")); eid += 1
    span(1, 0, 2)    # churned at duration 2
    span(2, 0, 2)    # churned at duration 2
    span(3, 0, 5)    # churned at duration 5
    span(4, 0, 29)   # active through the watermark: censored at 29
    sf = _write(tmp_path, {"events": pd.DataFrame(rows, columns=EV_COLS)})
    got = {r["duration_days"]: r for r in q_evt_survival_km(
        spark, sf
    ).collect()}
    # KM: t=2 -> n=4, d=2, S=0.5;  t=5 -> n=2, d=1, S=0.25.
    # The censored user contributes to the risk sets but never a row.
    assert set(got) == {2, 5}
    assert (got[2]["n_risk"], got[2]["n_churned"]) == (4, 2)
    assert abs(got[2]["survival"] - 0.5) < 1e-6
    assert (got[5]["n_risk"], got[5]["n_churned"]) == (2, 1)
    assert abs(got[5]["survival"] - 0.25) < 1e-6


# ---------------------------------------------------------------------------
# E23b: censoring fires under the driver corpora (r10 verdict item 2)
# ---------------------------------------------------------------------------


def test_survival_km_censored_branch_fires(spark):
    """On the REAL driver corpus (sf0.001), the synthesized-domain key
    must produce at least one duration row where censored users leave
    alongside churned ones (n_churned strictly below the risk-set drop
    to the next row) — the gap>0 branch the natural-domain key can
    never exercise (no 7-day-silent users in any driver corpus)."""
    from event_stream_checkout_spark.operators.events_analytics import (
        q_evt_survival_km_censored,
    )

    rows = q_evt_survival_km_censored(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "curve must be non-empty"
    # Censored mass exists: the initial risk set exceeds total deaths,
    # so some users left the study without churning — the branch E23's
    # natural domain can never exercise.
    deaths = sum(r["n_churned"] for r in rows)
    assert deaths < rows[0]["n_risk"]
    # And at least one curve row carries BOTH kinds of leavers: its
    # death count is strictly below its total exits (risk drop to the
    # next row, or the final row's full remaining risk set).
    exits = [
        a["n_risk"] - b["n_risk"] for a, b in zip(rows, rows[1:])
    ] + [rows[-1]["n_risk"]]
    assert any(
        r["n_churned"] < x for r, x in zip(rows, exits)
    )
    # and the curve stays a valid survival function
    surv = [r["survival"] for r in rows]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(a >= b for a, b in zip(surv, surv[1:]))
