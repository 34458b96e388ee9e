"""LLM-data-pipeline operators (SURVEY.md §2.10, X1-X5) over
``documents`` (text/lang/source) and ``embeddings`` (array<float>).

First wave: exact dedup, token stats, language profile, brute-force
cosine top-k.  The near-dup family (minhash LSH, simhash, n-gram
jaccard), quality scoring, lang-id and fingerprinting land in the
second wave — all expression-level, portable to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table


@register(
    "llm_exact_dedup",
    oracle="WITH hashed AS (SELECT doc_id, md5(text) AS text_hash FROM documents), "
    "ranked AS (SELECT *, row_number() OVER (PARTITION BY text_hash "
    "ORDER BY doc_id) AS rn, CAST(count(*) OVER (PARTITION BY text_hash) AS BIGINT)"
    " AS n_copies FROM hashed) "
    "SELECT doc_id, text_hash, n_copies FROM ranked WHERE rn = 1",
    doc="Exact content dedup (X1): md5(text) → keep lowest doc_id per "
    "hash. Generalizes the reference's content-addressed idempotency "
    "(src/ingest_order/app.py:30-32) to corpus scale; the groupBy "
    "shuffles on the hash — uniformly distributed, no skew.",
)
def q_llm_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").withColumn("text_hash", F.md5("text"))
    w = Window.partitionBy("text_hash").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(Window.partitionBy("text_hash")))
        .filter(F.col("rn") == 1)
        .select("doc_id", "text_hash", "n_copies")
    )


@register(
    "llm_token_stats",
    oracle="WITH toks AS (SELECT doc_id, lang, source, "
    "len(string_split(text, ' ')) AS n_tokens, n_chars FROM documents) "
    "SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(n_tokens) AS BIGINT) AS total_tokens, "
    "CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens, "
    "CAST(sum(n_chars) AS BIGINT) AS total_chars "
    "FROM toks GROUP BY lang, source",
    doc="Token counting + per-slice stats (X4): whitespace tokenizer "
    "as a split expression; counts reduce exactly (integers).",
)
def q_llm_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(F.split("text", " ", -1)).cast("long")
    )
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "llm_lang_profile",
    oracle="SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(count(DISTINCT source) AS BIGINT) AS n_sources, "
    "CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars, "
    "CAST(min(n_chars) AS BIGINT) AS min_chars, "
    "CAST(max(n_chars) AS BIGINT) AS max_chars "
    "FROM documents GROUP BY lang",
    doc="Corpus language profile (X4).",
)
def q_llm_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("source").alias("n_sources"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "llm_similarity_topk",
    # The oracle reproduces Spark's left-fold double accumulation
    # bit-for-bit: list_reduce is a sequential fold and 0.0+x1 == x1.
    oracle="WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0), "
    "scored AS (SELECT e.vec_id, e.label, "
    "  list_reduce(list_transform(generate_series(1, len(e.embedding)), "
    "    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)), "
    "    (x, y) -> x + y) AS dot, "
    "  sqrt(list_reduce(list_transform(e.embedding, "
    "    v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y)) AS nrm, "
    "  sqrt(list_reduce(list_transform(q.qv, "
    "    v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y)) AS qnrm "
    "  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0) "
    "SELECT vec_id, label, round(dot / (nrm * qnrm), 6) AS cosine "
    "FROM scored ORDER BY dot / (nrm * qnrm) DESC, vec_id LIMIT 20",
    doc="Brute-force cosine top-k (X3): exact baseline for ANN. Dot "
    "products via zip_with+aggregate (JVM expressions, no UDF); the "
    "query vector is a broadcast 1-row dimension. 100 TB path: "
    "partition-pruned IVF variant (llm_similarity_ivf).",
)
def q_llm_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    scored = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            (
                dot(F.col("embedding"), F.col("qv"))
                / (
                    F.sqrt(dot(F.col("embedding"), F.col("embedding")))
                    * F.sqrt(dot(F.col("qv"), F.col("qv")))
                )
            ).alias("cos_raw"),
        )
    )
    return (
        scored.orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
        .limit(20)
        .select("vec_id", "label", F.round("cos_raw", 6).alias("cosine"))
    )
