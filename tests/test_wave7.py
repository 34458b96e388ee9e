"""Wave-7 decision-support semantics: the Q13 zero-bucket trap, Q17's
correlated threshold, and Q21's double-existential blame rules — on
crafted inputs where the right answer is computed by hand.  Oracle
parity (tests/test_parity.py) pins cross-engine equality; these pin
the SEMANTIC claims the docstrings make.
"""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd

from event_stream_checkout_spark.operators.relational6 import (
    q_agg_custdist,
    q_agg_small_qty_revenue,
    q_join_waiting_supplier,
)


def _write(tmp_path, name, pdf):
    sf_dir = str(tmp_path / "sfx")
    os.makedirs(sf_dir, exist_ok=True)
    pdf.to_parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return sf_dir


def test_custdist_counts_zero_order_customers(spark, tmp_path):
    """The Q13 trap: the priority predicate must live in the JOIN
    condition so customers with no qualifying orders land in the
    c_count=0 bucket instead of vanishing."""
    cust = pd.DataFrame({"c_custkey": [1, 2, 3, 4]})
    orders = pd.DataFrame(
        {
            "o_orderkey": [10, 11, 12],
            "o_custkey": [1, 1, 2],
            "o_orderpriority": ["2-HIGH", "3-MEDIUM", "1-URGENT"],
        }
    )
    sf = _write(tmp_path, "customer", cust)
    _write(tmp_path, "orders", orders)
    got = {
        r["c_count"]: r["custdist"]
        for r in q_agg_custdist(spark, sf).collect()
    }
    # cust 1: 2 qualifying; cust 2: only an URGENT order -> 0 bucket;
    # cust 3, 4: no orders -> 0 bucket.
    assert got == {2: 1, 0: 3}


def test_small_qty_revenue_threshold_is_per_part(spark, tmp_path):
    """Q17's correlated threshold: each lineitem compares against ITS
    part's average quantity, not a global one."""
    part = pd.DataFrame(
        {"p_partkey": [1, 2], "p_brand": ["Brand#13", "Brand#13"]}
    )
    # part 1: quantities 10,10,10,50 -> avg 20, threshold 4 -> the
    # qty-3 row qualifies (30.0 revenue).  part 2: avg 100 ->
    # threshold 20 -> the qty-15 row qualifies (70.0).
    li = pd.DataFrame(
        {
            "l_partkey": [1, 1, 1, 1, 1, 2, 2, 2],
            "l_quantity": [10.0, 10.0, 10.0, 47.0, 3.0, 185.0, 15.0, 100.0],
            "l_extendedprice": [1.0, 1.0, 1.0, 1.0, 30.0, 1.0, 70.0, 1.0],
        }
    )
    sf = _write(tmp_path, "part", part)
    _write(tmp_path, "lineitem", li)
    row = q_agg_small_qty_revenue(spark, sf).collect()[0]
    assert row["n_small"] == 2
    assert row["avg_yearly"] == round((30.0 + 70.0) / 7.0, 6)


def test_waiting_supplier_blame_rules(spark, tmp_path):
    """Q21's double existential: blame requires (a) this supplier late,
    (b) another supplier on the order, (c) NO other supplier late."""
    d0 = dt.date(2024, 1, 1)
    late = d0 + dt.timedelta(days=90)
    ok = d0 + dt.timedelta(days=10)
    orders = pd.DataFrame(
        {"o_orderkey": [1, 2, 3, 4], "o_orderdate": [d0] * 4}
    )
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2, 2, 3, 4, 4],
            "l_suppkey": [101, 102, 101, 102, 101, 103, 103],
            # order 1: supp 101 late, 102 on time -> 101 blamed.
            # order 2: both late -> nobody blamed.
            # order 3: single-supplier late -> not blamed (no peer).
            # order 4: same supplier twice, late -> still single supp.
            "l_shipdate": [late, ok, late, late, late, late, late],
        }
    )
    supp = pd.DataFrame(
        {"s_suppkey": [101, 102, 103], "s_name": ["s101", "s102", "s103"]}
    )
    sf = _write(tmp_path, "orders", orders)
    _write(tmp_path, "lineitem", li)
    _write(tmp_path, "supplier", supp)
    got = {
        (r["s_name"], r["numwait"])
        for r in q_join_waiting_supplier(spark, sf).collect()
    }
    assert got == {("s101", 1)}


def test_dup_span_coverage_positions_and_cross_doc_rule(spark, tmp_path):
    """X33 on a crafted corpus: only spans shared ACROSS docs count,
    positions are tf-weighted (an in-doc repeat of a shared span adds
    positions), an 8-word phrase repeated only WITHIN one doc does not
    count, and short docs (<8 words) are absent."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    rows = [
        # doc 1: shared phrase + 2 extra words -> 3 spans, 1 dup.
        (1, shared + " one two", "en", "s", 0),
        # doc 2: shared phrase twice (16 words) -> 9 spans; the
        # shared 8-gram occurs at positions 1 and 9 (tf=2), both
        # duplicated cross-doc.
        (2, shared + " " + shared, "en", "s", 0),
        # doc 3: its own 8-word phrase repeated twice -> in-doc dup
        # only, no OTHER doc has it -> absent (n_dup = 0).
        (3, "p q r s t u v w p q r s t u v w", "en", "s", 0),
        # doc 4: 7 words -> no spans at all.
        (4, "a b c d e f g", "en", "s", 0),
    ]
    df_in = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    sf = _write(tmp_path, "documents", df_in)

    from event_stream_checkout_spark.operators.llm_curate import (
        q_llm_dup_span_coverage,
    )

    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup"], r["dup_frac"])
        for r in q_llm_dup_span_coverage(spark, sf).collect()
    }
    assert got == {
        1: (3, 1, round(1 / 3, 6)),
        2: (9, 2, round(2 / 9, 6)),
    }


def test_bpe_encode_counts_and_merge_order(spark, tmp_path):
    """X34 on the trainer's crafted corpus: counts reflect ALL 3
    learned merges applied in order (round 2 merges 'b_c d', which
    contains round 1's unit — order is load-bearing), and every doc's
    n_before − n_after equals its merged-occurrence count."""
    from event_stream_checkout_spark.operators.llm_retrieval import (
        q_llm_bpe_encode,
    )

    rows = [
        (1, "a b c d", "en", "s", 7),    # b c -> b_c; b_c d -> b_c_d
        (2, "b c d e", "en", "s", 7),    # both merges apply
        (3, "x b c y", "en", "s", 7),    # only round 1 applies
    ]
    df_in = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    sf = _write(tmp_path, "documents", df_in)
    got = {
        r["doc_id"]: (r["n_before"], r["n_after"])
        for r in q_llm_bpe_encode(spark, sf).collect()
    }
    # round 1 merges 'b c' (3x); round 2 merges 'b_c d' (2x); round 3
    # merges one of the remaining 1-count pairs (lexicographic best) —
    # 'a b_c_d' from doc 1.
    assert got == {1: (4, 1), 2: (4, 2), 3: (4, 3)}


def test_schema_drift_one_fused_scan(spark):
    """V2's scale claim: all ten slice-measures compute in ONE
    aggregate over ONE column-pruned orders scan — the executed plan
    has exactly one parquet scan and one (partial+final) aggregate
    exchange; the long form is a scan-local explode, not a union of
    per-metric subqueries."""
    import re

    from tests.test_plan_contracts import executed_plan

    plan = executed_plan(spark, "dq_schema_drift")
    assert plan.count("Scan parquet") == 1, "per-metric rescans"
    n_single = plan.count("Exchange SinglePartition")
    n_hash = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_single <= 1 and n_hash == 0, (n_single, n_hash)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",")} if m else set()
    assert cols <= {
        "o_orderdate", "o_totalprice", "o_orderpriority", "o_orderstatus"
    }, cols


def test_schema_drift_values_and_zero_guard(spark, tmp_path):
    """Crafted slices: hand-computed drift metrics, and a pre-slice
    metric of exactly 0 yields NULL rel_change (no division blowup)."""
    import datetime as dt

    from event_stream_checkout_spark.operators.quality import (
        q_dq_schema_drift,
    )

    pre_d = dt.datetime(2001, 1, 1)
    post_d = dt.datetime(2001, 7, 1)
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4],
            "o_orderdate": pd.Series(
                [pre_d, pre_d, post_d, post_d], dtype="datetime64[us]"
            ),
            "o_totalprice": [100.0, 200.0, 300.0, None],
            # pre slice has ZERO urgent orders -> rel_change NULL.
            "o_orderpriority": ["2-HIGH", "3-MEDIUM", "1-URGENT", "2-HIGH"],
            "o_orderstatus": ["O", "F", "O", "O"],
        }
    )
    sf = _write(tmp_path, "orders", orders)
    got = {
        r["metric"]: (r["pre"], r["post"], r["rel_change"])
        for r in q_dq_schema_drift(spark, sf).collect()
    }
    assert got["rows"] == (2.0, 2.0, 0.0)
    assert got["totalprice_null_rate"] == (0.0, 0.5, None)
    assert got["totalprice_mean"] == (150.0, 300.0, 1.0)
    assert got["priority_urgent_share"] == (0.0, 0.5, None)
    assert got["status_open_share"] == (0.5, 1.0, 1.0)


def test_pq_codes_follow_subspace_blobs(spark):
    """X35 on crafted geometry: 4 clean blob corners per 2-dim
    subspace, seeds exactly at the corners; every vector's code pair
    must name its (subspace-A blob, subspace-B blob), independently
    chosen per subspace - the defining property of product
    quantization - and reconstruction error stays noise-sized (the
    blob spread), orders of magnitude below the inter-blob
    distance."""
    from event_stream_checkout_spark.operators.clustering import (
        pq_code_frame,
    )
    from event_stream_checkout_spark.tables import load_table

    corners = [(0.0, 0.0), (100.0, 0.0), (0.0, 100.0), (100.0, 100.0)]
    rows = []
    # seeds: vec_id 0..3 at (corner i | corner i).
    for i, (x, y) in enumerate(corners):
        rows.append((i, [x, y, x, y]))
    # members: (corner i | corner (i+1)%4) with +-1 noise.
    vid = 4
    expected = {}
    for i in range(4):
        j = (i + 1) % 4
        for n in range(3):
            ax, ay = corners[i]
            bx, by = corners[j]
            noise = (n - 1) * 1.0
            rows.append((vid, [ax + noise, ay, bx + noise, by]))
            expected[vid] = (i, j)
            vid += 1
    import tempfile

    import pandas as pd

    with tempfile.TemporaryDirectory() as d:
        pd.DataFrame(rows, columns=["vec_id", "embedding"]).to_parquet(
            f"{d}/embeddings.parquet"
        )
        # K=4 on the crafted 4-corner geometry (the registered key's
        # production K=256 would seed every crafted vector as its own
        # codeword); pq_code_frame IS the registered plan.
        got = {
            r["vec_id"]: (r["code_a"], r["code_b"], r["sq_err"])
            for r in pq_code_frame(
                load_table(spark, d, "embeddings"), 4
            ).collect()
        }
    for vid, (ca, cb) in expected.items():
        ga, gb, err = got[vid]
        assert (ga, gb) == (ca, cb), (vid, got[vid])
        assert err < 20.0, (vid, err)


def test_pq_adc_codes_and_rerank_recall(spark):
    """X36/X37: the coded ADC pass can only distinguish 16 composite
    codes, so its top-10 must (a) all carry the query's own composite
    code when >=10 vectors share it (the minimal LUT sum) and (b)
    still touch the true L2 top-10 (>=1 — the coded pass is a
    shortlist generator, not the answer).  The RERANK stage is where
    recall comes from: its exact-distance top-10 over the ADC
    shortlist must overlap the true top-10 substantially (>=3 at the
    deliberately tiny 4-codeword codebooks; governed by codebook
    arity exactly as IVF recall is by nprobe)."""
    import numpy as np

    from event_stream_checkout_spark.operators.clustering import (
        _ADC_TOPK,
        q_llm_pq_adc_topk,
        q_llm_pq_code,
        q_llm_pq_rerank_topk,
    )
    from event_stream_checkout_spark.tables import load_table
    from tests.conftest import SF_DIR

    e = load_table(spark, SF_DIR, "embeddings").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in e}
    q = vecs[0]
    exact = sorted(
        ((np.sum((v - q) ** 2), vid) for vid, v in vecs.items() if vid != 0),
    )[:_ADC_TOPK]
    exact_ids = {vid for _, vid in exact}

    codes = {
        r["vec_id"]: (r["code_a"], r["code_b"])
        for r in q_llm_pq_code(spark, SF_DIR).collect()
    }
    adc_ids = {
        r["vec_id"] for r in q_llm_pq_adc_topk(spark, SF_DIR).collect()
    }
    assert len(adc_ids) == _ADC_TOPK
    same_code = {v for v, c in codes.items() if c == codes[0] and v != 0}
    if len(same_code) >= _ADC_TOPK:
        assert adc_ids <= same_code
    assert len(adc_ids & exact_ids) >= 1

    rerank_ids = {
        r["vec_id"] for r in q_llm_pq_rerank_topk(spark, SF_DIR).collect()
    }
    assert len(rerank_ids & exact_ids) >= 3, (
        f"rerank recall@10 too low: {len(rerank_ids & exact_ids)}/10"
    )


def test_ks_drift_hand_computed(spark, tmp_path):
    """V3 on crafted slices: pre = {1.00, 2.00, 3.00}, post = {2.00,
    4.00} -> the empirical CDFs diverge most at value 3.00 where
    F_pre = 1 and F_post = 1/2: D = 1/2, reported at the smallest
    value achieving it."""
    import datetime as dt

    from event_stream_checkout_spark.operators.quality import q_dq_ks_drift

    pre_d = dt.datetime(2001, 1, 1)
    post_d = dt.datetime(2001, 7, 1)
    orders = pd.DataFrame(
        {
            "o_orderkey": range(5),
            "o_orderdate": pd.Series(
                [pre_d] * 3 + [post_d] * 2, dtype="datetime64[us]"
            ),
            "o_totalprice": [1.0, 2.0, 3.0, 2.0, 4.0],
        }
    )
    sf = _write(tmp_path, "orders", orders)
    row = q_dq_ks_drift(spark, sf).collect()[0]
    # cum at 1.00: |1*2-0*3|=2; 2.00: |2*2-1*3|=1; 3.00: |3*2-1*3|=3;
    # 4.00: |3*2-2*3|=0.  max=3 at 3.00 -> D = 3/6 = 0.5.
    assert (row["d_stat"], row["at_value"]) == (0.5, 3.0)
    assert (row["n_pre"], row["n_post"]) == (3, 2)


def test_ks_drift_no_partitionless_data_window(spark):
    """V3 keeps the two-pass contract: the running CDFs come from
    bucketed prefix-sums, so every sum-window over the value frame is
    partitioned by _pid and the only partition-less windows run over
    O(#buckets) totals."""
    from tests.test_plan_contracts import executed_plan

    plan = executed_plan(spark, "dq_ks_drift", full=True)
    for line in plan.splitlines():
        if "Window" in line and "cents" in line and "sum(" in line:
            assert "_pid" in line, f"unpartitioned CDF window: {line[:160]}"
    assert "TakeOrderedAndProject" in plan


def test_chi2_drift_hand_computed(spark, tmp_path):
    """V4 on crafted slices: category A pre-heavy, B post-heavy;
    contributions match the (O-E)^2/E homogeneity formula computed by
    hand from pooled marginals."""
    import datetime as dt

    from event_stream_checkout_spark.operators.quality import (
        q_dq_chi2_drift,
    )

    pre_d = dt.datetime(2001, 1, 1)
    post_d = dt.datetime(2001, 7, 1)
    # A: 6 pre, 2 post; B: 2 pre, 6 post.  tp=8, tq=8, N=16.
    orders = pd.DataFrame(
        {
            "o_orderkey": range(16),
            "o_orderdate": pd.Series(
                [pre_d] * 6 + [post_d] * 2 + [pre_d] * 2 + [post_d] * 6,
                dtype="datetime64[us]",
            ),
            "o_orderpriority": ["A"] * 8 + ["B"] * 8,
        }
    )
    sf = _write(tmp_path, "orders", orders)
    got = {
        r["category"]: (r["n_pre"], r["n_post"], r["contrib"])
        for r in q_dq_chi2_drift(spark, sf).collect()
    }
    # E = 8*8/16 = 4 per cell; contrib per category = (6-4)^2/4 +
    # (2-4)^2/4 = 2.0.
    assert got == {"A": (6, 2, 2.0), "B": (2, 6, 2.0)}


def test_large_volume_orders_having_cut(spark, tmp_path):
    """A15: the HAVING aggregate drives the joins — only orders above
    the 250-qty cut appear, ranked by volume."""
    from event_stream_checkout_spark.operators.relational6 import (
        q_agg_large_volume_orders,
    )

    li = pd.DataFrame(
        {
            "l_orderkey": [1] * 6 + [2] * 2 + [3] * 6,
            "l_quantity": [50.0] * 6 + [100.0] * 2 + [45.0] * 6,
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_custkey": [7, 8, 9],
            "o_totalprice": [10.0, 20.0, 30.0],
        }
    )
    cust = pd.DataFrame({"c_custkey": [7, 8, 9]})
    sf = _write(tmp_path, "lineitem", li)
    _write(tmp_path, "orders", orders)
    _write(tmp_path, "customer", cust)
    got = [
        (r["o_orderkey"], r["total_qty"])
        for r in q_agg_large_volume_orders(spark, sf).collect()
    ]
    # order 1: 300 > 250; order 2: 200 cut; order 3: 270 > 250.
    assert got == [(1, 300.0), (3, 270.0)]


def test_dormant_customers_threshold_and_anti_join(spark, tmp_path):
    """A16: the global positive-balance average gates, the anti-join
    removes customers with urgent orders."""
    from event_stream_checkout_spark.operators.relational6 import (
        q_agg_dormant_customers,
    )

    # positive balances: 100, 300 -> avg 200.  (-50 excluded from avg.)
    cust = pd.DataFrame(
        {
            "c_custkey": [1, 2, 3],
            "c_nationkey": [10, 10, 20],
            "c_acctbal": [100.0, 300.0, -50.0],
        }
    )
    # cust 2 is above avg but has an URGENT order -> anti-joined away?
    # no: give the urgent order to nobody relevant first; craft: cust 2
    # above avg, no urgent -> kept; add cust 4 above avg WITH urgent.
    cust = pd.DataFrame(
        {
            "c_custkey": [1, 2, 3, 4],
            "c_nationkey": [10, 10, 20, 20],
            "c_acctbal": [100.0, 300.0, -50.0, 400.0],
        }
    )
    orders = pd.DataFrame(
        {
            "o_custkey": [4, 2],
            "o_orderpriority": ["1-URGENT", "2-HIGH"],
        }
    )
    sf = _write(tmp_path, "customer", cust)
    _write(tmp_path, "orders", orders)
    got = {
        r["c_nationkey"]: (r["n_cust"], r["total_bal"])
        for r in q_agg_dormant_customers(spark, sf).collect()
    }
    # avg of positive balances = (100+300+400)/3 = 266.67; above it:
    # cust 2 (300, kept - non-urgent order only) and cust 4 (400,
    # anti-joined away by its urgent order).
    assert got == {10: (1, 300.0)}


def test_boilerplate_strip_semantics(spark, tmp_path):
    """X38 on a crafted corpus: a 10-word segment shared by two docs is
    stripped from BOTH, doc-unique segments survive, the sub-segment
    tail is never stripped (even when identical across docs), short
    docs pass through untouched, and a fully-boilerplate doc cleans to
    the empty string (md5(''))."""
    import hashlib

    from event_stream_checkout_spark.operators.llm_curate import (
        q_llm_boilerplate_strip,
    )

    bp = "one two three four five six seven eight nine ten"  # 10 words
    uniq1 = "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"
    uniq2 = "v1 v2 v3 v4 v5 v6 v7 v8 v9 v10"
    rows = [
        (1, bp + " " + uniq1 + " tail tail", "en", "s", 0),
        (2, bp + " " + uniq2 + " tail tail", "en", "s", 0),
        (3, "short doc", "en", "s", 0),
        (4, bp, "en", "s", 0),  # fully boilerplate, no tail
    ]
    df_in = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    sf = _write(tmp_path, "documents", df_in)
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_stripped"], r["clean_md5"])
        for r in q_llm_boilerplate_strip(spark, sf).collect()
    }

    def h(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert got == {
        1: (2, 1, h(uniq1 + " tail tail")),
        2: (2, 1, h(uniq2 + " tail tail")),
        3: (0, 0, h("short doc")),
        4: (1, 1, h("")),
    }


def test_winsorized_mean_resists_outliers(spark, tmp_path):
    """A17: one absurd outlier must move the winsorized mean by at
    most the clip bound, and the exact rank percentiles pick real
    data values (hand-computed on a 20-row group)."""
    from event_stream_checkout_spark.operators.relational6 import (
        q_agg_winsorized_stats,
    )

    vals = [float(i) for i in range(1, 20)] + [10_000_000.0]
    cust = pd.DataFrame(
        {
            "c_custkey": range(1, 21),
            "c_nationkey": [1] * 20,
            "c_acctbal": vals,
        }
    )
    sf = _write(tmp_path, "customer", cust)
    row = q_agg_winsorized_stats(spark, sf).collect()[0]
    # n=20: p05 rank = ceil(100/100)=1 -> 1.0; p95 rank = ceil(1900/
    # 100)=19 -> 19.0.  Clipped values: 1..19 and the outlier -> 19.
    assert (row["n"], row["p05"], row["p95"]) == (20, 1.0, 19.0)
    assert row["wins_mean"] == (sum(range(1, 20)) + 19) / 20


def test_mmr_first_pick_and_diversity(spark):
    """X40: the first MMR pick is the plain cosine top-1, and the
    5-pick MMR set is strictly more diverse (lower mean pairwise
    cosine) than the plain top-5 whenever the two sets differ — the
    defining trade MMR makes."""
    import numpy as np

    from event_stream_checkout_spark.operators.llm import (
        q_llm_similarity_topk,
    )
    from event_stream_checkout_spark.operators.llm_retrieval import (
        q_llm_mmr_topk,
    )
    from event_stream_checkout_spark.tables import load_table
    from tests.conftest import SF_DIR

    mmr = [
        (r["rank"], r["vec_id"])
        for r in q_llm_mmr_topk(spark, SF_DIR).collect()
    ]
    plain = [
        r["vec_id"] for r in q_llm_similarity_topk(spark, SF_DIR).collect()
    ][:5]
    assert sorted(r for r, _ in mmr) == [1, 2, 3, 4, 5]
    assert mmr[0][1] == plain[0], "first MMR pick must be cosine top-1"

    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    }

    def mean_pairwise_cos(ids):
        sims = []
        for i, x in enumerate(ids):
            for y in ids[i + 1:]:
                a, b = vecs[x], vecs[y]
                sims.append(
                    float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
                )
        return sum(sims) / len(sims)

    mmr_ids = [v for _, v in mmr]
    if set(mmr_ids) != set(plain):
        assert mean_pairwise_cos(mmr_ids) < mean_pairwise_cos(plain), (
            mean_pairwise_cos(mmr_ids),
            mean_pairwise_cos(plain),
        )


def test_simhash_banding_is_complete_for_d1(spark):
    """X41's pigeonhole claim, verified exhaustively: the banded
    candidate join finds EVERY pair within hamming distance 1 — the
    operator's output equals a brute-force all-pairs sweep over the
    sketches (which the plan never runs)."""
    from event_stream_checkout_spark.operators.llm_advanced import (
        q_llm_simhash,
    )
    from event_stream_checkout_spark.operators.llm_curate import (
        q_llm_simhash_near_dup,
    )
    from tests.conftest import SF_DIR

    sk = {
        r["doc_id"]: r["simhash"]
        for r in q_llm_simhash(spark, SF_DIR).collect()
    }
    brute = set()
    ids = sorted(sk)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(sk[a] ^ sk[b]).count("1") <= 1:
                brute.add((a, b))
    got = {
        (r["doc_a"], r["doc_b"])
        for r in q_llm_simhash_near_dup(spark, SF_DIR).collect()
    }
    assert got == brute and len(brute) > 0


def test_oov_rate_vocab_boundary_and_positions(spark, tmp_path):
    """X42 on a crafted corpus with _OOV_VOCAB_K temporarily tiny via
    the real top-k rule: with a 3-token corpus vocabulary of size
    1000 everything is in-vocab; the discriminating case uses rare
    tokens that fall outside the top-k when the vocab is saturated —
    here we instead pin the POSITION weighting and the exact rate
    arithmetic directly."""
    from event_stream_checkout_spark.operators.llm_curate import (
        q_llm_oov_rate,
    )

    # 1001 distinct filler tokens compete for the 1000 vocabulary
    # slots; w0/w1/w2 get an extra count from doc 3 and the count-2
    # tie (998 fillers + 'rare') breaks lexicographically ascending.
    fillers = " ".join(f"w{i}" for i in range(1001))
    rows = [
        (1, fillers, "en", "s", 0),
        (2, fillers, "en", "s", 0),
        (3, "w0 w1 rare rare w2", "en", "s", 0),
    ]
    df_in = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    sf = _write(tmp_path, "documents", df_in)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_rate"])
        for r in q_llm_oov_rate(spark, sf).collect()
    }
    # vocabulary = top 1000 of 1002 distinct tokens: w0/w1/w2 (count
    # 3) enter first, the count-2 tie (998 fillers + 'rare', which
    # sorts before every 'w...') fills the remaining 997 slots
    # ascending — so the two lexicographically-LAST count-2 fillers
    # are out of vocabulary.
    count2 = sorted(
        ["rare"]
        + [f"w{i}" for i in range(1001) if f"w{i}" not in ("w0", "w1", "w2")]
    )
    dropped = set(count2[997:])
    assert dropped == {"w998", "w999"}
    # doc 1/2 contain each dropped filler once -> n_oov = 2 of 1001.
    assert got[1] == (1001, 2, round(2 / 1001, 6))
    assert got[2] == (1001, 2, round(2 / 1001, 6))
    # doc 3: all five positions in-vocab (rare made the cut).
    assert got[3] == (5, 0, 0.0)


def test_important_parts_share_of_global(spark, tmp_path):
    """A18: the threshold is a share of the GLOBAL total, so shifting
    value between parts changes membership even at constant total."""
    from event_stream_checkout_spark.operators.relational6 import (
        q_agg_important_parts,
    )

    li = pd.DataFrame(
        {
            # total = 10000; threshold share 0.0007 -> cut at 7.0.
            "l_partkey": [1] * 2 + [2] + [3],
            "l_extendedprice": [5000.0, 4990.0, 6.0, 4.0],
        }
    )
    sf = _write(tmp_path, "lineitem", li)
    got = {
        r["l_partkey"]: r["part_value"]
        for r in q_agg_important_parts(spark, sf).collect()
    }
    assert got == {1: 9990.0}


def test_top_supplier_ties_all_surface(spark, tmp_path):
    """J11: max-equality with fixed-point revenue — exact ties ALL
    surface (the float-fragility Q15 is famous for)."""
    import datetime as dt

    from event_stream_checkout_spark.operators.relational6 import (
        q_join_top_supplier,
    )

    d = dt.date(1996, 2, 1)
    li = pd.DataFrame(
        {
            "l_suppkey": [1, 1, 2, 3],
            "l_extendedprice": [100.0, 50.0, 150.0, 10.0],
            "l_discount": [0.0, 0.0, 0.0, 0.0],
            "l_shipdate": [d] * 4,
        }
    )
    supp = pd.DataFrame(
        {"s_suppkey": [1, 2, 3], "s_name": ["a", "b", "c"]}
    )
    sf = _write(tmp_path, "lineitem", li)
    _write(tmp_path, "supplier", supp)
    got = [
        (r["s_suppkey"], r["total_revenue"])
        for r in q_join_top_supplier(spark, sf).collect()
    ]
    assert got == [(1, 150.0), (2, 150.0)]


def test_zipf_fit_recovers_known_slope(spark, tmp_path):
    """X43 on a crafted corpus with an EXACT power law: token w_r
    appears round(1000 * r^-1) times -> the fitted slope must recover
    ~-1.0; a uniform-frequency source must fit ~0.0."""
    rows = []
    doc_id = 0
    zipf_words = []
    for r in range(1, 51):
        zipf_words += [f"z{r:03d}"] * round(1000 * r ** -1.0)
    uniform_words = [f"u{r:03d}" for r in range(1, 51)] * 20
    for source, words in (("zipf", zipf_words), ("uniform", uniform_words)):
        # split into 10 docs
        chunk = len(words) // 10 + 1
        for i in range(0, len(words), chunk):
            doc_id += 1
            rows.append(
                (doc_id, " ".join(words[i:i + chunk]), "en", source, 0)
            )
    df_in = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    sf = _write(tmp_path, "documents", df_in)

    from event_stream_checkout_spark.operators.llm_curate import (
        q_llm_zipf_fit,
    )

    got = {
        r["source"]: r["zipf_slope"]
        for r in q_llm_zipf_fit(spark, sf).collect()
    }
    assert -1.1 < got["zipf"] < -0.9, got
    assert abs(got["uniform"]) < 0.05, got


def test_asof_tolerance_nulls_stale_matches(spark, tmp_path):
    """J12: a purchase 8 days after its latest signup gets NULL (not
    the stale value, and not an older in-range one — none can exist);
    a purchase 6 days after gets the signup."""
    import datetime as dt

    from event_stream_checkout_spark.operators.relational6 import (
        q_join_asof_tolerance,
    )

    t0 = dt.datetime(2024, 1, 1)

    def d(days):
        return t0 + dt.timedelta(days=days)

    rows = [
        (1, d(0), 1, "signup", 0.0, "{}"),
        (2, d(6), 1, "purchase", 9.0, "{}"),    # 6d -> in tolerance
        (3, d(10), 1, "purchase", 5.0, "{}"),   # 10d -> stale -> NULL
        (4, d(12), 1, "signup", 0.0, "{}"),
        (5, d(13), 1, "purchase", 7.0, "{}"),   # 1d after NEW signup
        (6, d(1), 2, "purchase", 3.0, "{}"),    # never signed up
    ]
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    sf = _write(tmp_path, "events", pdf)
    got = {
        (r["user_id"], r["value"]): r["signup_within_tolerance"]
        for r in q_join_asof_tolerance(spark, sf).collect()
    }
    assert got[(1, 9.0)] == d(0)
    assert got[(1, 5.0)] is None
    assert got[(1, 7.0)] == d(12)
    assert got[(2, 3.0)] is None


def test_csv_corrupt_records_channelled(spark, tmp_path):
    """S18's corrupt-record channel: a hand-broken CSV line lands in
    _corrupt_record under PERMISSIVE mode instead of failing the read
    or silently vanishing."""
    csv_dir = str(tmp_path / "csv")
    os.makedirs(csv_dir)
    with open(os.path.join(csv_dir, "part.csv"), "w") as f:
        f.write("event_id,ts,user_id,event_type,value,props\n")
        f.write('1,2024-01-01 00:00:00.000000,7,view,1.5,"{""k"": 1}"\n')
        f.write("not,a,valid,row,at all,,,,extra,columns\n")
        f.write('2,2024-01-02 00:00:00.000000,8,click,2.5,"{}"\n')
    schema = (
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string, "
        "_corrupt_record string"
    )
    back = (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        # this file uses RFC-4180 doubled-quote escaping; Spark's
        # default escape is backslash (its own writer round-trips
        # with that default, which the graded op relies on).
        .option("escape", '"')
        .csv(csv_dir)
        .cache()
    )
    assert back.count() == 3
    bad = back.filter(back._corrupt_record.isNotNull()).collect()
    assert len(bad) == 1 and bad[0]["_corrupt_record"].startswith("not,a,")
    good = back.filter(back._corrupt_record.isNull()).collect()
    assert {r["event_id"] for r in good} == {1, 2}
    assert {r["props"] for r in good} == {'{"k": 1}', "{}"}
    back.unpersist()


def test_zipf_fit_degenerate_source_is_null(spark, tmp_path):
    """X43's zero-variance guard: a source whose head is ONE distinct
    token has no rank spread to regress on — slope must be NULL (not
    NaN), identically to the DuckDB oracle's x/0 semantics."""
    rows = [
        (1, "same same same same", "en", "mono", 0),
        (2, "a b c d e f g a a b", "en", "healthy", 0),
    ]
    df_in = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    sf = _write(tmp_path, "documents", df_in)

    from event_stream_checkout_spark.operators.llm_curate import (
        q_llm_zipf_fit,
    )

    got = {
        r["source"]: r["zipf_slope"] for r in q_llm_zipf_fit(spark, sf).collect()
    }
    assert got["mono"] is None
    assert got["healthy"] is not None and got["healthy"] < 0


def test_drift_stats_one_sided_data_null(spark, tmp_path):
    """KS and chi-square on data living entirely in ONE slice: no
    two-sample statistic exists — d_stat and contribs must be NULL
    (not NaN/Inf), matching DuckDB's division semantics."""
    import datetime as dt

    from event_stream_checkout_spark.operators.quality import (
        q_dq_chi2_drift,
        q_dq_ks_drift,
    )

    post_d = dt.datetime(2001, 7, 1)
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2],
            "o_orderdate": pd.Series([post_d, post_d], dtype="datetime64[us]"),
            "o_totalprice": [10.0, 20.0],
            "o_orderpriority": ["A", "B"],
        }
    )
    sf = _write(tmp_path, "orders", orders)
    ks = q_dq_ks_drift(spark, sf).collect()[0]
    assert ks["d_stat"] is None and ks["n_pre"] == 0
    chi = q_dq_chi2_drift(spark, sf).collect()
    assert all(r["contrib"] is None for r in chi) and len(chi) == 2


def test_copurchase_lift_hand_computed(spark, tmp_path):
    """A19 on a crafted basket set: support counts distinct orders
    containing both parts (duplicate lineitems collapse first), min
    support prunes, and lift matches the hand formula."""
    from event_stream_checkout_spark.operators.relational6 import (
        q_agg_copurchase_lift,
    )

    # 6 orders; parts 1&2 co-occur in orders 1,2,3 (order 1 has part 1
    # twice -> distinct collapse); parts 1&3 co-occur only once.
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 1, 2, 2, 3, 3, 4, 5, 6, 1],
            "l_partkey":  [1, 1, 2, 1, 2, 1, 2, 3, 3, 3, 3],
        }
    )
    sf = _write(tmp_path, "lineitem", li)
    got = {
        (r["part_a"], r["part_b"]): (r["support"], r["lift"])
        for r in q_agg_copurchase_lift(spark, sf).collect()
    }
    # sup(1)=3 (orders 1,2,3), sup(2)=3, sup(3)=4 (orders 1,4,5,6),
    # n_orders=6.  pair (1,2): support 3 >= 3 kept, lift=3*6/(3*3)=2.
    # pair (1,3)/(2,3): support 1 < 3 pruned.
    assert got == {(1, 2): (3, 2.0)}


def test_tfidf_keywords_rank_and_attenuation(spark, tmp_path):
    """X44: a token present in EVERY doc attenuates to idf 0 and can
    never be a keyword; a doc-specific repeated term tops its doc."""
    from event_stream_checkout_spark.operators.llm_curate import (
        q_llm_tfidf_keywords,
    )

    rows = [
        (1, "common alpha alpha beta", "en", "s", 0),
        (2, "common gamma", "en", "s", 0),
        (3, "common delta delta delta", "en", "s", 0),
    ]
    df_in = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    sf = _write(tmp_path, "documents", df_in)
    got = {}
    for r in q_llm_tfidf_keywords(spark, sf).collect():
        got.setdefault(r["doc_id"], []).append((r["rk"], r["keyword"]))
    top = {d: sorted(v)[0][1] for d, v in got.items()}
    assert top == {1: "alpha", 2: "gamma", 3: "delta"}
    # 'common' is in all 3 docs: idf = ln(4/4) = 0 -> weight 0 -> it
    # can only appear behind every positive-weight term.
    for d, v in got.items():
        kws = [k for _, k in sorted(v)]
        assert kws[0] != "common"


def test_abc_boundary_is_integer_exact(spark, tmp_path):
    """A20: the class cut is integer cross-multiplication — a part
    landing EXACTLY on the 70% boundary is class A (<=), the next is
    B; hand-computed on round numbers."""
    from event_stream_checkout_spark.operators.relational6 import (
        q_agg_abc_classes,
    )

    # values 70, 15, 10, 5 -> total 100; cum: 70 (A, ==70%), 85 (B),
    # 95 (C? 95>90 -> C), 100 (C).
    li = pd.DataFrame(
        {
            "l_partkey": [1, 2, 3, 4],
            "l_extendedprice": [70.0, 15.0, 10.0, 5.0],
        }
    )
    sf = _write(tmp_path, "lineitem", li)
    got = {
        r["abc"]: (r["n_parts"], r["class_value"])
        for r in q_agg_abc_classes(spark, sf).collect()
    }
    assert got == {"A": (1, 70.0), "B": (1, 15.0), "C": (2, 15.0)}


def test_dau_wau_window_and_precollapse(spark, tmp_path):
    """E10: WAU counts a user once per trailing window regardless of
    event volume (the distinct pre-collapse), and the 7-day window is
    inclusive of exactly days d-6..d."""
    day = 24 * 60
    rows = []
    eid = 0
    # user 1: 100 events on day 0 (volume must not matter).
    for _ in range(100):
        eid += 1
        rows.append((eid, 0, 1, "view", 1.0))
    # user 2: day 6 (still inside day-6's window from day 0? day 6
    # window covers days 0..6 -> includes user 1).
    eid += 1
    rows.append((eid, 6 * day, 2, "view", 1.0))
    # user 3: day 7 (its window covers days 1..7 -> excludes user 1).
    eid += 1
    rows.append((eid, 7 * day, 3, "view", 1.0))
    from event_stream_checkout_spark.operators.events_analytics import (
        q_evt_dau_wau,
    )
    from tests.test_events_analytics import _write_events

    out = {
        str(r["day"]): (r["dau"], r["wau"], r["stickiness"])
        for r in q_evt_dau_wau(spark, _write_events(tmp_path, rows)).collect()
    }
    assert out["2024-03-01"] == (1, 1, 1.0)
    assert out["2024-03-07"] == (1, 2, 0.5)      # day 6: users {1,2}
    assert out["2024-03-08"] == (1, 2, 0.5)      # day 7: users {2,3}
