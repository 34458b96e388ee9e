"""Adversarial distribution properties for the two sketch aggregates
(r4/r5 verdict ask #8): the registered queries prove the bounds on the
driver's well-behaved testdata; these tests prove the SAME sketch
settings hold on the distributions that break naive sketches — zipf
skew, all-distinct, single-value, and empty inputs.

Sketch settings mirror the registered queries exactly:
- approx_count_distinct rsd=0.01, asserted within the documented 2%
  relative-error bound (operators/relational.py q_agg_approx_distinct).
- percentile_approx accuracy=10000, asserted within the exact order
  statistics at the ±0.5% neighboring ranks — the same integer rank
  math as q_agg_approx_percentile (operators/relational3.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

N = 20_000


def _shapes(spark):
    """(name, DataFrame with a long `v` column) for the four adversarial
    distributions.  All pure column arithmetic — deterministic across
    runs and partitionings."""
    r = spark.range(N)
    return {
        # v = N div (id+1): harmonic multiplicities — value 1 appears
        # ~N/2 times, value 2 ~N/6 times, ... a zipf-like head on a
        # long distinct tail.  The classic HLL/quantile stress shape:
        # a few mega-hot values plus many rank-1 values.
        "zipf": r.select((F.lit(N) / (F.col("id") + 1)).cast("long").alias("v")),
        "all_distinct": r.select(F.col("id").alias("v")),
        "single_value": r.select(F.lit(7).cast("long").alias("v")),
        "empty": spark.range(0).select(F.col("id").alias("v")),
    }


@pytest.mark.parametrize(
    "shape", ["zipf", "all_distinct", "single_value", "empty"]
)
def test_approx_distinct_bound(spark, shape):
    df = _shapes(spark)[shape]
    row = df.agg(
        F.approx_count_distinct("v", rsd=0.01).alias("approx"),
        F.count_distinct("v").alias("exact"),
    ).collect()[0]
    # Same integer-safe bound as the registered verdict:
    # 100*|approx-exact| <= 2*exact (empty: both sides 0).
    assert 100 * abs(row["approx"] - row["exact"]) <= 2 * row["exact"], (
        shape,
        row["approx"],
        row["exact"],
    )


def test_jaccard_pair_expansion_bounded(spark):
    """r7 skew guard (VERDICT r6 item 1): a boilerplate gram shared by
    B docs in one (lang, bucket) cell must NOT expand to O(B²) pairs.

    Corpus: 60 docs whose ONLY overlap is one hot gram (df=60 > cap=10)
    plus 2 unique grams each — without the cap every pair would land at
    jaccard = 1/(3+3-1) = 0.2, exactly at the threshold, i.e. 1770
    output rows.  With the cap the hot gram is dropped from the gram
    space, so those docs share nothing and produce ZERO pairs.  A
    second group of exactly cap docs sharing one gram (df = cap, NOT
    dropped) must still produce its full cap·(cap-1)/2 = 45 pairs —
    the cap bounds expansion without killing legitimate similarity."""
    from event_stream_checkout_spark.operators.llm_advanced import (
        _JACCARD_DF_CAP,
        jaccard_pairs,
    )

    assert _JACCARD_DF_CAP == 10  # the arithmetic below assumes it
    rows = []
    for i in range(60):  # hot group: df=60 > cap
        rows += [
            (i, "en", 0, "terms of service"),
            (i, "en", 0, f"uniq {i} a"),
            (i, "en", 0, f"uniq {i} b"),
        ]
    for i in range(100, 110):  # at-cap group: df=10 == cap
        rows += [
            (i, "en", 0, "fine shared gram"),
            (i, "en", 0, f"uniq {i} a"),
            (i, "en", 0, f"uniq {i} b"),
        ]
    dg = spark.createDataFrame(
        rows, "doc_id long, lang string, bucket long, gram string"
    )
    got = jaccard_pairs(dg).collect()
    assert len(got) == 45, len(got)  # O(cap²) from the legit group only
    assert all(r["doc_a"] >= 100 and r["doc_b"] >= 100 for r in got)
    assert all(abs(r["jaccard"] - 0.2) < 1e-12 for r in got)


@pytest.mark.parametrize(
    "shape", ["zipf", "all_distinct", "single_value", "empty"]
)
def test_approx_percentile_rank_bound(spark, shape):
    df = _shapes(spark)[shape]
    pct = F.expr("percentile_approx(v, array(0.5D, 0.9D, 0.99D), 10000)")
    est = df.agg(
        pct[0].alias("p50"), pct[1].alias("p90"), pct[2].alias("p99")
    ).collect()[0]
    values = sorted(r["v"] for r in df.collect())
    n = len(values)
    if n == 0:
        # Empty input: the sketch must yield NULL, not a fabricated 0.
        assert est["p50"] is None and est["p90"] is None and est["p99"] is None
        return
    for name, plo, phi in (("p50", 495, 505), ("p90", 895, 905), ("p99", 985, 995)):
        lo = values[max(1, (plo * n) // 1000) - 1]
        hi = values[min(n, (phi * n + 999) // 1000) - 1]
        assert lo <= est[name] <= hi, (shape, name, est[name], lo, hi)


# --------------------------------------------------------------------------
# r7 property tests: capped jaccard vs brute force; weighted-mix
# thresholds vs an independent reference computation.
# --------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_corpus_st = st.lists(
    st.tuples(
        st.sampled_from(["en", "de"]),       # lang
        st.integers(0, 1),                   # bucket
        st.sets(st.integers(0, 12), min_size=1, max_size=6),  # gram ids
    ),
    min_size=2,
    max_size=12,
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_corpus_st)
def test_jaccard_pairs_matches_bruteforce(spark, corpus):
    """jaccard_pairs == a python brute-force over the capped gram
    space, for arbitrary small corpora — guards the df-cap refactor on
    shapes the fixed oracle corpus never produces (cross-lang,
    cross-bucket, disjoint, and identical docs)."""
    from event_stream_checkout_spark.operators.llm_advanced import (
        _JACCARD_DF_CAP,
        jaccard_pairs,
    )

    rows = [
        (i, lang, bucket, f"g{g}")
        for i, (lang, bucket, grams) in enumerate(corpus)
        for g in grams
    ]
    dg = spark.createDataFrame(
        rows, "doc_id long, lang string, bucket long, gram string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["n_common"], r["n_a"], r["n_b"], round(r["jaccard"], 9)
        )
        for r in jaccard_pairs(dg).collect()
    }

    # Brute force: drop (gram, lang, bucket) cells with df > cap, then
    # all-pairs jaccard within (lang, bucket), threshold 0.2.
    from collections import Counter

    cells = Counter((lang, b, g) for _, lang, b, g in rows)
    docs = {}
    for i, lang, b, g in rows:
        if cells[(lang, b, g)] <= _JACCARD_DF_CAP:
            docs.setdefault(i, (lang, b, set()))[2].add(g)
    want = {}
    ids = sorted(docs)
    for x in ids:
        for y in ids:
            if x >= y:
                continue
            lx, bx, gx = docs[x]
            ly, by, gy = docs[y]
            if (lx, bx) != (ly, by):
                continue
            inter = len(gx & gy)
            if inter == 0:
                continue
            jac = inter / (len(gx) + len(gy) - inter)
            if jac >= 0.2:
                want[(x, y)] = (inter, len(gx), len(gy), round(jac, 9))
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts=st.lists(st.integers(1, 200), min_size=1, max_size=5),
    weights=st.lists(st.integers(1, 9), min_size=1, max_size=5),
)
def test_weighted_mix_thresholds_match_reference(spark, counts, weights):
    """The engine's weighted-mix thresholds == an independent python
    computation of min_t (65536·w_s·n_t) // (w_t·n_s) capped at 65535,
    for arbitrary counts/weights — the integer math must be exact, not
    approximately right."""
    import os
    import tempfile

    import pandas as pd

    from event_stream_checkout_spark.operators.llm_ingest import (
        _MIX_BUCKETS,
        domain_mix_weighted,
    )

    n = min(len(counts), len(weights))
    counts, weights = counts[:n], weights[:n]
    pdf = pd.DataFrame(
        [
            (si * 100_000 + i, f"d {i}", "en", f"s{si}", 3)
            for si, c in enumerate(counts)
            for i in range(c)
        ],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    with tempfile.TemporaryDirectory() as td:
        sf_dir = os.path.join(td, "sf")
        os.makedirs(sf_dir)
        pdf.to_parquet(os.path.join(sf_dir, "documents.parquet"))
        wmap = {f"s{si}": w for si, w in enumerate(weights)}
        got = {
            r["source"]: (r["n_docs"], r["weight"], r["threshold"])
            for r in domain_mix_weighted(spark, sf_dir, wmap).collect()
        }
    want = {}
    for si, (c, w) in enumerate(zip(counts, weights)):
        thr = min(
            min(
                (_MIX_BUCKETS * w * ct) // (wt * c)
                for ct, wt in zip(counts, weights)
            ),
            _MIX_BUCKETS - 1,
        )
        want[f"s{si}"] = (c, w, thr)
    assert got == want


@pytest.mark.parametrize(
    "shape", ["zipf", "all_distinct", "single_value", "empty"]
)
def test_freq_items_superset_guarantee(spark, shape):
    """A5c (same settings as q_agg_freq_items, k=6): on every
    adversarial shape, EVERY value with true frequency > N/6 must
    appear in the freqItems sketch — zipf's mega-hot head, the
    single-value column, and (vacuously) the all-distinct and empty
    shapes."""
    from event_stream_checkout_spark.operators.relational4 import _FI_K

    df = _shapes(spark)[shape]
    n = df.count()
    exact_hot = {
        r["v"]
        for r in df.groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") * _FI_K > F.lit(n))
        .collect()
    }
    expected_hot = {"zipf": True, "single_value": True}.get(shape, False)
    assert bool(exact_hot) == expected_hot, (shape, exact_hot)
    items = set(
        df.stat.freqItems(["v"], support=1.0 / _FI_K).collect()[0][0]
    )
    assert exact_hot <= items, (shape, exact_hot - items)
