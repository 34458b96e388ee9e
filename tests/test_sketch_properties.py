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
