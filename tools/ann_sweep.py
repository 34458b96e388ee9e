"""ANN recall sweep: measure recall@K of the learned-centroid IVF
(llm_similarity_ivf_kmeans's machinery) against exact brute force, as
a function of nprobe — the measured trade-off curve behind the
operator's docstring claim that "recall is governed by nprobe exactly
as in IVF theory".

Usage: python tools/ann_sweep.py [sf_dir] [n_queries]
Prints one JSON line: {"sf":..., "k":..., "recall": {nprobe: mean}}.

Method: the first N_QUERIES vectors are treated as queries, the rest
as the corpus.  Exact top-K per query = full cosine rank (one
broadcast-join pass).  IVF candidates per query = corpus vectors
assigned to the query's nprobe nearest refined centroids; recall@K =
|IVF∩exact| / K averaged over queries.  Everything reuses the
engine's fixed-point k-means (operators/clustering.py) — the sweep
measures the REGISTERED machinery, not a reimplementation.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from event_stream_checkout_spark.operators.clustering import (  # noqa: E402
    _KM_K,
    kmeans_refined,
)
from event_stream_checkout_spark.session import get_session  # noqa: E402
from event_stream_checkout_spark.tables import load_table  # noqa: E402

K = 10
NPROBES = (1, 2, 3, 4, 8)


def dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    spark = get_session("ann-sweep")
    e = load_table(spark, sf_dir, "embeddings")
    d2, a2 = kmeans_refined(e, _KM_K)

    queries = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    corpus = e.filter(F.col("vec_id") >= n_queries)

    # Exact top-K per query: one broadcast of the small query set.
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        "qid",
        "vec_id",
        (
            dot(F.col("embedding"), F.col("qv"))
            / (
                F.sqrt(dot(F.col("embedding"), F.col("embedding")))
                * F.sqrt(dot(F.col("qv"), F.col("qv")))
            )
        ).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), "vec_id")
    exact = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .select("qid", "vec_id")
    )
    exact_sets: dict[int, set] = {}
    for r in exact.collect():
        exact_sets.setdefault(r["qid"], set()).add(r["vec_id"])

    # Query-to-centroid distance ranks (from the registered machinery).
    qd = (
        d2.filter(F.col("vec_id") < n_queries)
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy("dq", "cluster")
            ),
        )
        .select(F.col("vec_id").alias("qid"), "cluster", "crank")
    )
    membership = a2.filter(F.col("vec_id") >= n_queries).select(
        "cluster", "vec_id"
    )

    recall = {}
    for nprobe in NPROBES:
        cand = (
            qd.filter(F.col("crank") <= nprobe)
            .join(membership, "cluster")
            .select("qid", "vec_id")
        )
        cand_sets: dict[int, set] = {}
        for r in cand.collect():
            cand_sets.setdefault(r["qid"], set()).add(r["vec_id"])
        vals = [
            len(exact_sets[q] & cand_sets.get(q, set())) / float(K)
            for q in exact_sets
        ]
        recall[nprobe] = round(sum(vals) / len(vals), 4)

    print(
        json.dumps(
            {"sf_dir": sf_dir, "k": K, "n_queries": n_queries,
             "km_k": _KM_K, "recall": recall}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
