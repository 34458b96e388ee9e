"""PQ recall sweep: measure recall@10 of the ADC-shortlist + exact
rerank query path (llm_pq_rerank_topk's machinery) against exact
brute force, as a function of codebook arity K — the measured curve
behind X35-X37's claim that "recall is governed by codebook arity
exactly as IVF recall is by nprobe".

Usage: python tools/pq_sweep.py [sf_dir] [n_queries] [K1,K2,...] [m] [shortlist] [--sampled]
(--sampled trains codebooks on the md5(vec_id) half-corpus — the
registered llm_pq_rerank_topk r11 configuration — so the sampled-
training recall point is measured with the registered machinery.)
(m = number of subspaces, default 2; r8 verdict item 3 asked for the
m=4 point — 16-d subspaces on the 64-d corpus — where training rows
per centroid stay at n/K while composite resolution is K^m.)
Prints one JSON line: {"sf":..., "topk":..., "shortlist":...,
"m":..., "recall": {K: mean}}.

Method: the first N_QUERIES vectors are queries, scored against the
full corpus (minus themselves).  Codebooks per subspace come from the
ENGINE's fixed-point seeded-Lloyd round (operators/clustering.py
kmeans_refined on the half-vectors) — the sweep measures the
REGISTERED machinery; only the final per-query recall arithmetic is
driver-side numpy over the collected (codes, LUT) frames, which are
n-row slim outputs, not corpus math.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from event_stream_checkout_spark.operators.clustering import (  # noqa: E402
    _PQ_TRAIN_HI,
    kmeans_refined,
    kmeans_refined_full,
)
from event_stream_checkout_spark.session import get_session  # noqa: E402
from event_stream_checkout_spark.tables import load_table  # noqa: E402

TOPK = 10
SHORTLIST = 50
ARITIES = (2, 4, 8, 16)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    arities = (
        tuple(int(a) for a in sys.argv[3].split(","))
        if len(sys.argv) > 3
        else ARITIES
    )
    spark = get_session("pq-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    m = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    shortlist = int(sys.argv[5]) if len(sys.argv) > 5 else SHORTLIST
    sampled = "--sampled" in sys.argv

    e = load_table(spark, sf_dir, "embeddings")
    rows = e.select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], np.float64) for r in rows}
    d = len(next(iter(vecs.values())))
    w = d // m  # subspace width (d assumed divisible by m)
    subs = [
        e.select(
            "vec_id",
            F.slice("embedding", F.lit(i * w + 1), F.lit(w)).alias("embedding"),
        )
        for i in range(m)
    ]

    queries = sorted(vecs)[:n_queries]
    exact = {}
    for q in queries:
        qv = vecs[q]
        dist = sorted(
            (float(((v - qv) ** 2).sum()), vid)
            for vid, v in vecs.items()
            if vid != q
        )
        exact[q] = {vid for _, vid in dist[:TOPK]}

    recall = {}
    for K in arities:
        assigns = []  # per-subspace {vec_id: cluster}
        luts = []     # per-subspace {(vec_id, cluster): dq}
        for sub in subs:
            if sampled:
                tr = F.substring(
                    F.md5(F.col("vec_id").cast("string")), 1, 4
                ) < _PQ_TRAIN_HI
                _, d2i, ai = kmeans_refined_full(
                    sub, K, train=sub.filter(tr)
                )
            else:
                d2i, ai = kmeans_refined(sub, K)
            assigns.append({r["vec_id"]: r["cluster"] for r in ai.collect()})
            # per-(query, cluster) fixed-point LUTs straight from the
            # refiner's distance frames — only QUERY rows are ever
            # looked up, so collect n_queries·K rows, not n·K (at
            # K=256 on the sf1 fixture the unfiltered frame is 10M
            # rows of pure driver-transfer waste)
            luts.append(
                {
                    (r["vec_id"], r["cluster"]): r["dq"]
                    for r in d2i.filter(
                        F.col("vec_id").isin(list(queries))
                    ).collect()
                }
            )
        scores = []
        for q in queries:
            adc = sorted(
                (
                    sum(
                        luts[i][(q, assigns[i][v])] for i in range(m)
                    ),
                    v,
                )
                for v in vecs
                if v != q
            )
            short = [v for _, v in adc[:shortlist]]
            rr = sorted(
                (float(((vecs[v] - vecs[q]) ** 2).sum()), v) for v in short
            )
            got = {v for _, v in rr[:TOPK]}
            scores.append(len(got & exact[q]) / TOPK)
        recall[K] = round(sum(scores) / len(scores), 3)

    print(
        json.dumps(
            {
                "sf": sf_dir,
                "topk": TOPK,
                "shortlist": shortlist,
                "dim": d,
                "m": m,
                "sampled_training": sampled,
                "recall": recall,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
