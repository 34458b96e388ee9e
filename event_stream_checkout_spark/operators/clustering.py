"""Distributed clustering over the embedding corpus (SURVEY.md §2.10
X26): Lloyd-iteration k-means refinement — the iterative-ML shape
(assign → recompute → reassign) expressed as DataFrame rounds, and the
learned-centroid upgrade path for the sign-bucket IVF index
(llm_similarity_ivf keeps its buckets static; a real ANN index
refreshes its coarse quantizer with exactly these rounds).

Engine-exactness: k-means is normally hostile to cross-engine hash
checks (float distance sums depend on reduction order).  Here every
reduction follows the repo's fixed-point policy (functions/numeric):
per-(vector, centroid) squared-distance terms are quantized per DIM
and summed as DECIMAL(25,0) — order-independent — so assignments,
centroids (davg) and inertia are bit-identical on any engine and any
partitioning, and the whole iteration is oracle-hash-checkable.

Scale shape: the exploded (vec, dim, val) frame is pinned once and
reused by all rounds; centroids are k·d rows — BROADCAST to the
distance join (the corpus never shuffles for assignment; the only
corpus-sized exchanges are the per-vector argmin window and the
centroid-update aggregate, both keyed on uniform ids).  At 100 TB the
same plan holds: assignment is map-side against broadcast centroids,
and each round's cost is O(n·d·k) flat map work + two uniform shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import SCALE, davg, quant, sql_davg, sql_quant
from ..registry import register
from ..tables import load_table

_KM_K = 8  # coarse-quantizer arity (seeds = vec_id < k, deterministic)

_SQL_EX = (
    "ex AS (SELECT e.vec_id, t.i - 1 AS dim, "
    "CAST(e.embedding[t.i] AS DOUBLE) AS val "
    "FROM embeddings e, "
    "UNNEST(generate_series(1, len(e.embedding))) AS t(i))"
)

_SQL_D2 = sql_quant("(ex.val - c.cval) * (ex.val - c.cval)")


def _sql_assign(cent: str, dname: str, aname: str) -> str:
    return (
        f"{dname} AS (SELECT ex.vec_id, c.cluster, SUM({_SQL_D2}) AS dq "
        f"FROM ex JOIN {cent} c USING (dim) GROUP BY 1, 2), "
        f"{aname} AS (SELECT vec_id, cluster, dq FROM "
        f"(SELECT *, row_number() OVER (PARTITION BY vec_id "
        f"ORDER BY dq, cluster) AS rn FROM {dname}) WHERE rn = 1)"
    )


@register(
    "llm_kmeans_refine",
    oracle=f"WITH {_SQL_EX}, "
    f"seeds AS (SELECT vec_id AS cluster, dim, val AS cval FROM ex "
    f"WHERE vec_id < {_KM_K}), "
    + _sql_assign("seeds", "d1", "a1")
    + ", "
    "c1 AS (SELECT a1.cluster, ex.dim, "
    f"{sql_davg('ex.val')} AS cval "
    "FROM ex JOIN a1 ON ex.vec_id = a1.vec_id GROUP BY 1, 2), "
    + _sql_assign("c1", "d2", "a2")
    + " SELECT cluster, CAST(count(*) AS BIGINT) AS n_members, "
    "CAST(SUM(dq) AS DOUBLE) / 10000.0 AS inertia "
    "FROM a2 GROUP BY cluster",
    doc="k-means refinement rounds (X26): deterministic seeds (the "
    "first k vectors) → assign every vector to its nearest seed → "
    "recompute centroids as per-dim stable means → reassign — one "
    "full Lloyd iteration plus the final assignment, reporting "
    "per-cluster membership and exact fixed-point inertia. Distances "
    "sum DECIMAL-quantized per-dim terms (order-independent ⇒ "
    "engine-exact argmin; ties broken by cluster id); centroids are "
    "broadcast k·d-row frames, so the corpus never shuffles for "
    "assignment — the exploded vector frame is pinned once and feeds "
    "every round. This is the refresh loop for the IVF coarse "
    "quantizer (llm_similarity_ivf); more rounds = the same CTE/loop "
    "body repeated.",
)
def q_llm_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    a2 = kmeans_refined_assignment(
        load_table(spark, sf_dir, "embeddings"), _KM_K
    )
    return a2.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"),
        (F.sum("dq").cast("double") / F.lit(SCALE)).alias("inertia"),
    )


def kmeans_refined_assignment(e: DataFrame, k: int) -> DataFrame:
    """One Lloyd round + final assignment over an embeddings frame —
    factored out of the registered query so tests can drive it with
    crafted blob geometries and inspect per-vector assignments
    (tests/test_curation.py).  Returns (vec_id, cluster, dq)."""
    ex = (
        e.select(
            "vec_id", F.posexplode("embedding").alias("dim", "fval")
        )
        .select("vec_id", "dim", F.col("fval").cast("double").alias("val"))
        .localCheckpoint()
    )
    seeds = ex.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cluster"), "dim", F.col("val").alias("cval")
    )

    def assign(cent: DataFrame) -> DataFrame:
        diff = F.col("val") - F.col("cval")
        dq = (
            ex.join(F.broadcast(cent), "dim")
            .groupBy("vec_id", "cluster")
            .agg(F.sum(quant(diff * diff)).alias("dq"))
        )
        w = Window.partitionBy("vec_id").orderBy("dq", "cluster")
        return (
            dq.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cluster", "dq")
        )

    a1 = assign(seeds)
    c1 = (
        ex.join(a1.select("vec_id", "cluster"), "vec_id")
        .groupBy("cluster", "dim")
        .agg(davg("val").alias("cval"))
    )
    return assign(c1)
