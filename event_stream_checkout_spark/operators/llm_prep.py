"""LLM-data-pipeline operators, wave 4 (round 4): training-example
preparation and privacy.

Three operations between a curated corpus and a training run:

- ``llm_context_chunks`` — fixed-context-window chunking with stride
  overlap: every document becomes one-or-more ≤CHUNK-word windows,
  consecutive windows sharing CHUNK-STRIDE words, tail windows fully
  covered by their predecessor dropped. The standard example-prep step
  for fixed-context training and retrieval indexing.
- ``llm_vocabulary`` — corpus vocabulary: per-token occurrence and
  document-frequency counts, top 100 by occurrences. The input to
  tokenizer training and stopword/IDF tables.
- ``llm_pseudonymize`` — salted-hash pseudonymization of customer
  keys across orders⋈customer with a referential-integrity proof:
  per-segment counts and exact revenue computed entirely over
  pseudonyms. The privacy step before operational data becomes
  training/analytics data: joins must still work after the direct
  identifier is gone.

Reference parity: the reference (an order-checkout system,
Ravindra-Reddy27/Event-Stream-Checkout) has no corpus or privacy
operators; these extend the engine's training-data surface per the
build brief. Hashing is md5 throughout (portable across engines,
unlike xxhash64 — see llm_advanced.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum, sql_dsum
from ..registry import register
from ..tables import load_table, with_min_scan_parallelism

# --------------------------------------------------------------------------
# X14: fixed-context-window chunking
# --------------------------------------------------------------------------

# 64-word windows every 48 words → 16 words of overlap.  A trailing
# window of ≤ CHUNK-STRIDE words is fully contained in its predecessor
# (its words are exactly the predecessor's overlap tail) and is dropped;
# the integer predicate `n_words > CHUNK - STRIDE` encodes that
# portably on both engines.
_CHUNK = 64
_STRIDE = 48


@register(
    "llm_context_chunks",
    oracle="WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws "
    "FROM documents), "
    f"s AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws), {_STRIDE}))"
    " AS st FROM w), "
    "c AS (SELECT doc_id, "
    f"CAST((st - 1) // {_STRIDE} AS BIGINT) AS chunk_id, "
    f"CAST(least({_CHUNK}, len(ws) - st + 1) AS BIGINT) AS n_words, "
    f"array_to_string(list_slice(ws, st, st + {_CHUNK - 1}), ' ') "
    "AS chunk_text FROM s) "
    "SELECT doc_id, chunk_id, n_words, chunk_text FROM c "
    f"WHERE chunk_id = 0 OR n_words > {_CHUNK - _STRIDE}",
    doc="Fixed-context-window chunking (X14): each document emits "
    f"{_CHUNK}-word windows every {_STRIDE} words (overlap "
    f"{_CHUNK - _STRIDE}); covered tail windows dropped. Plan: pure "
    "scan-local flatMap — sequence+posexplode+slice inside one "
    "WholeStageCodegen span, zero KEY exchanges (no hash, no single "
    "partition; asserted by plan contract — the only exchange is the "
    "round-robin scan-parallelism one, a no-op on splittable input). "
    "At 100 TB this is embarrassingly parallel and "
    "output-bounded (~n_words/stride rows per doc); no key, no skew, "
    "no shuffle — the ideal shape for the highest-volume prep step.",
)
def q_llm_context_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_min_scan_parallelism(
        spark, load_table(spark, sf_dir, "documents")
    )
    d = d.select("doc_id", F.split("text", " ", -1).alias("_w"))
    starts = F.sequence(F.lit(1), F.size("_w"), F.lit(_STRIDE))
    c = d.select(
        "doc_id",
        F.size("_w").alias("_n"),
        F.col("_w"),
        F.posexplode(starts).alias("chunk_id", "st"),
    ).select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.least(F.lit(_CHUNK), F.col("_n") - F.col("st") + 1)
        .cast("long")
        .alias("n_words"),
        F.concat_ws(" ", F.slice(F.col("_w"), F.col("st"), F.lit(_CHUNK)))
        .alias("chunk_text"),
    )
    return c.filter(
        (F.col("chunk_id") == 0) | (F.col("n_words") > _CHUNK - _STRIDE)
    )


# --------------------------------------------------------------------------
# X17: greedy sequence packing
# --------------------------------------------------------------------------

# Training sequences hold _SEQ_CAP words; chunks are packed greedily in
# (doc_id, chunk_id) order without splitting: a chunk belongs to the
# sequence where its running-word offset starts, so a straddling chunk
# overflows its sequence by < chunk length (greedy no-split packing).
# Packing is per (source, shard): production packs within output
# shards, never globally — a global pack order would serialize the
# corpus through one sort.
_SEQ_CAP = 256
_PACK_SHARDS = 8


@register(
    "llm_sequence_pack",
    oracle="WITH w AS (SELECT doc_id, source, string_split(text, ' ') "
    "AS ws FROM documents), "
    f"s AS (SELECT doc_id, source, ws, unnest(generate_series(1, len(ws), "
    f"{_STRIDE})) AS st FROM w), "
    "c AS (SELECT doc_id, source, "
    f"CAST((st - 1) // {_STRIDE} AS BIGINT) AS chunk_id, "
    f"CAST(least({_CHUNK}, len(ws) - st + 1) AS BIGINT) AS n_words FROM s), "
    f"k AS (SELECT * FROM c WHERE chunk_id = 0 OR n_words > "
    f"{_CHUNK - _STRIDE}), "
    f"p AS (SELECT source, CAST(doc_id % {_PACK_SHARDS} AS BIGINT) AS shard, "
    "doc_id, chunk_id, n_words, "
    f"sum(n_words) OVER (PARTITION BY source, doc_id % {_PACK_SHARDS} "
    "ORDER BY doc_id, chunk_id ROWS UNBOUNDED PRECEDING) - n_words "
    "AS off FROM k) "
    f"SELECT source, shard, CAST(off // {_SEQ_CAP} AS BIGINT) AS seq_id, "
    "CAST(count(*) AS BIGINT) AS n_chunks, "
    "CAST(sum(n_words) AS BIGINT) AS n_words_packed, "
    f"CAST((sum(n_words) * 100) // {_SEQ_CAP} AS BIGINT) AS fill_pct "
    "FROM p GROUP BY 1, 2, 3",
    doc="Greedy no-split sequence packing (X17): X14's chunks are "
    f"packed into {_SEQ_CAP}-word training sequences in (doc_id, "
    "chunk_id) order — each chunk joins the sequence where its "
    "running-word offset starts, so sequences overflow by < one chunk "
    "and are never fragmented. Packing is per (source, doc_id%"
    f"{_PACK_SHARDS}) shard, the production shape: a window keyed "
    "(source, shard) bounds every sort to one shard, and the final "
    "per-sequence rollup groups on a superset of the window key so "
    "Catalyst reuses the window's partitioning — ONE shuffle in the "
    "whole plan (asserted by contract). At 100 TB, shard count scales "
    "with the corpus while each in-shard sort stays executor-sized.",
)
def q_llm_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = with_min_scan_parallelism(
        spark, load_table(spark, sf_dir, "documents")
    )
    d = d.select("doc_id", "source", F.split("text", " ", -1).alias("_w"))
    starts = F.sequence(F.lit(1), F.size("_w"), F.lit(_STRIDE))
    c = d.select(
        "doc_id",
        "source",
        F.size("_w").alias("_n"),
        F.posexplode(starts).alias("chunk_id", "st"),
    ).select(
        "doc_id",
        "source",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.least(F.lit(_CHUNK), F.col("_n") - F.col("st") + 1)
        .cast("long")
        .alias("n_words"),
    )
    k = c.filter(
        (F.col("chunk_id") == 0) | (F.col("n_words") > _CHUNK - _STRIDE)
    ).withColumn(
        "shard", (F.col("doc_id") % _PACK_SHARDS).cast("long")
    )
    win = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = k.withColumn(
        "off", F.sum("n_words").over(win) - F.col("n_words")
    )
    return p.groupBy(
        "source",
        "shard",
        F.floor(F.col("off") / _SEQ_CAP).cast("long").alias("seq_id"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum("n_words").cast("long").alias("n_words_packed"),
        F.floor(F.sum("n_words") * 100 / _SEQ_CAP)
        .cast("long")
        .alias("fill_pct"),
    )


# --------------------------------------------------------------------------
# X15: corpus vocabulary / document frequency
# --------------------------------------------------------------------------


@register(
    "llm_vocabulary",
    oracle="WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) "
    "AS token FROM documents), "
    "f AS (SELECT token, doc_id, count(*) AS c FROM t "
    "WHERE token <> '' GROUP BY 1, 2) "
    "SELECT token, CAST(sum(c) AS BIGINT) AS n_occurrences, "
    "CAST(count(*) AS BIGINT) AS n_docs "
    "FROM f GROUP BY token "
    "ORDER BY n_occurrences DESC, token LIMIT 100",
    doc="Corpus vocabulary (X15): per-token total occurrences and "
    "document frequency, top 100 by occurrences (token tiebreak — "
    "LIMIT is deterministic). Plan: explode → (token, doc_id) count → "
    "token rollup → TakeOrderedAndProject. Two shuffles; the first is "
    "keyed by (token, doc_id) so Zipf-hot tokens ('the') spread over "
    "every document id — the per-token rollup then receives "
    "pre-collapsed rows (≤ one per document), never raw occurrences. "
    "Top-k is per-partition heaps + driver merge of 100-row heads, no "
    "global sort, no single-partition data stage.",
)
def q_llm_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_min_scan_parallelism(
        spark, load_table(spark, sf_dir, "documents")
    )
    t = d.select(
        "doc_id", F.explode(F.split("text", " ", -1)).alias("token")
    ).filter(F.col("token") != "")
    f = t.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    v = f.groupBy("token").agg(
        F.sum("c").cast("long").alias("n_occurrences"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    return v.orderBy(F.desc("n_occurrences"), F.asc("token")).limit(100)


# --------------------------------------------------------------------------
# X16: pseudonymization with referential integrity
# --------------------------------------------------------------------------

# Fixed, documented salt: pseudonyms are stable across runs and tables
# (that is the point — referential integrity), but the raw key is not
# recoverable without the salt.  A production deployment would inject
# the salt from a secret store; the VALUE here is part of the query's
# public contract so the oracle can reproduce it.
_PSEUD_SALT = "esc-pseud-v1:"


@register(
    "llm_pseudonymize",
    oracle="WITH c AS (SELECT md5('" + _PSEUD_SALT + "' || "
    "CAST(c_custkey AS VARCHAR)) AS pid, c_mktsegment FROM customer), "
    "o AS (SELECT md5('" + _PSEUD_SALT + "' || "
    "CAST(o_custkey AS VARCHAR)) AS pid, o_totalprice FROM orders) "
    "SELECT c.c_mktsegment, "
    "CAST(count(DISTINCT c.pid) AS BIGINT) AS n_customers, "
    "CAST(count(*) AS BIGINT) AS n_orders, "
    + sql_dsum("o.o_totalprice")
    + " AS revenue FROM o JOIN c ON o.pid = c.pid "
    "GROUP BY c.c_mktsegment",
    doc="Salted-hash pseudonymization (X16): customer keys are "
    "replaced by md5(salt || key) in BOTH orders and customer, the "
    "direct identifiers (c_name) are dropped, and the per-segment "
    "rollup — distinct customers, order count, exact revenue — is "
    "computed entirely over pseudonyms, proving joins survive "
    "anonymization. Plan: scan-local hashing (no pre-join shuffle "
    "beyond the join's own), AQE owns the join strategy; pseudonyms "
    "are md5-uniform so the join key cannot skew worse than the raw "
    "key. Revenue uses the engine's order-independent exact-sum "
    "policy (functions/numeric.py).",
)
def q_llm_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.md5(
            F.concat(F.lit(_PSEUD_SALT), F.col("c_custkey").cast("string"))
        ).alias("pid"),
        "c_mktsegment",
    )
    ords = load_table(spark, sf_dir, "orders").select(
        F.md5(
            F.concat(F.lit(_PSEUD_SALT), F.col("o_custkey").cast("string"))
        ).alias("pid"),
        "o_totalprice",
    )
    return (
        ords.join(cust, "pid")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("pid").cast("long").alias("n_customers"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
    )
