"""Focused tests for the r16 optimization-round internals.

Each test pins the INVARIANT an optimization relies on, so a future
edit can't silently break the equivalence the speedup was argued from:

- ``sampled_boundaries_multi`` batches N independent boundary probes
  into one action; consumers must get a usable boundary list per leg
  ([] for an empty leg — single bucket, no fallback job).
- ``quantile_bucketed(bounds_values=...)`` must give exact-rank
  consumers the SAME answer under ANY boundary set (boundaries affect
  balance only) — the contract that makes the batched/precomputed
  boundary paths safe.
- ``bpe_rounds`` literal-winner chaining must mirror the staged loop's
  empty-corpus edge: a round with no pairs empties every later round
  and the encoder output.
- ``kmeans_refined_pair`` (concurrent) must equal two sequential
  trainings bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_sampled_boundaries_multi_per_leg(spark):
    from event_stream_checkout_spark.operators.relational import (
        sampled_boundaries_multi,
    )

    a = spark.range(0, 2000).select(F.col("id").cast("double").alias("v"))
    b = spark.range(0, 2000).select((F.col("id") * 100).alias("w"))
    empty = a.filter(F.col("v") < 0)
    bounds = sampled_boundaries_multi(
        [(a, "v"), (b, "w"), (empty, "v")], nb=8, fraction=0.5
    )
    assert len(bounds) == 3
    assert len(bounds[0]) == 7 and len(bounds[1]) == 7
    assert bounds[0] == sorted(bounds[0])
    # boundaries track each leg's own scale
    assert max(bounds[1]) > max(bounds[0]) * 10
    # empty leg -> [] (single bucket, no fallback boundary job)
    assert bounds[2] == []


def test_quantile_bucketed_exact_ranks_under_any_bounds(spark):
    """Exact rank selection is invariant under arbitrary (even
    pathological) boundary values — the property every batched/
    precomputed boundary caller rests on."""
    from event_stream_checkout_spark.operators.relational import (
        quantile_bucketed,
        rank_from_buckets,
    )

    df = spark.range(1, 501).select(F.col("id").cast("double").alias("v"))
    keys = [F.col("v").desc(), F.col("v")]

    def ranked(bounds_values):
        b = quantile_bucketed(df, "v", nb=8, bounds_values=bounds_values)
        return {
            r["v"]: r["pos"]
            for r in rank_from_buckets(b, keys).select("v", "pos").collect()
        }

    default = ranked(None)
    # pathological: all mass below every boundary / single boundary
    assert ranked([1e9] * 7) == default
    assert ranked([250.0]) == default
    assert ranked([]) == default
    assert default[500.0] == 1 and default[1.0] == 500


def test_bpe_rounds_empty_corpus_edge(spark):
    """No doc has >= 2 tokens: every round has no winner and the
    encoder's corpus is empty — the staged loop's crossJoin-with-empty
    behavior the literal-chain path must mirror."""
    from event_stream_checkout_spark.operators.llm_retrieval import (
        bpe_rounds,
    )

    d = spark.createDataFrame(
        [(1, "solo"), (2, "word")], "doc_id long, text string"
    )
    out, final = bpe_rounds(spark, d, rewrite_last=True)
    assert all(df.count() == 0 for df in out)
    assert final.count() == 0
    assert set(final.columns) == {"doc_id", "text"}
    # winner frames keep the graded schema
    assert [f.name for f in out[0].schema.fields] == ["round", "pair", "cnt"]


def test_bpe_rounds_chain_matches_round_semantics(spark):
    """Round 2 counts pairs over the round-1-MERGED corpus: the
    literal chain must apply the previous winner before recounting."""
    from event_stream_checkout_spark.operators.llm_retrieval import (
        bpe_rounds,
    )

    d = spark.createDataFrame(
        [(i, "a b c a b") for i in range(10)], "doc_id long, text string"
    )
    out, final = bpe_rounds(spark, d, rewrite_last=True)
    r1 = out[0].collect()[0]
    assert (r1["pair"], r1["cnt"]) == ("a b", 20)
    r2 = out[1].collect()[0]
    # after merging "a b" -> "a_b": text is "a_b c a_b"; best pair is
    # "a_b c" (count 10; "c a_b" ties at 10 but sorts later).
    assert (r2["pair"], r2["cnt"]) == ("a_b c", 10)
    texts = {r["text"] for r in final.collect()}
    assert len(texts) == 1  # all docs rewritten identically


def test_kmeans_refined_pair_equals_sequential(spark):
    from event_stream_checkout_spark.operators.clustering import (
        kmeans_refined_full,
        kmeans_refined_pair,
    )

    e = spark.createDataFrame(
        [(i, [float(i % 7), float((i * 3) % 5), float(i % 2), 1.0])
         for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    n = F.size("embedding")
    h = (n / 2).cast("int")
    sub_a = e.select("vec_id", F.slice("embedding", F.lit(1), h).alias("embedding"))
    sub_b = e.select(
        "vec_id", F.slice("embedding", h + 1, (n - h)).alias("embedding")
    )
    (_, _, aa_p), (_, _, ab_p) = kmeans_refined_pair(sub_a, sub_b, 4)
    _, _, aa_s = kmeans_refined_full(sub_a, 4)
    _, _, ab_s = kmeans_refined_full(sub_b, 4)

    def rows(df):
        return sorted(
            (r["vec_id"], r["cluster"], r["dq"]) for r in df.collect()
        )

    assert rows(aa_p) == rows(aa_s)
    assert rows(ab_p) == rows(ab_s)
