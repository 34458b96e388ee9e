"""Multimodal columns (SURVEY.md §2.10 X5 + §2.9 U1-U3).

Media (image/audio/video) is carried as opaque ``binary`` columns with
a typed metadata struct — the standard large-scale pattern: bytes stay
columnar in parquet, all relational ops (dedup, join, filter, window)
apply losslessly, and decoding happens late inside Arrow-batched
Pandas UDFs (``mapInPandas``) so only the partitions that need pixels
ever touch them.

The container ships no image/audio libraries, so the decoders are
STUBBED exactly as the build contract requires: the Spark-side
plumbing (schema, batching, UDF signatures, partition behavior) is
real and tested; ``decode_image``/``decode_audio`` raise
NotImplementedError unless a deterministic fake is requested.

Since the driver testdata has no media table, ``media_df`` derives a
deterministic binary corpus from ``documents`` (text bytes standing in
for media payloads) — which also makes the mapInPandas feature
extractor oracle-checkable: byte length and md5 are computable by
DuckDB on the same derivation.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..tables import load_table

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType(), True),
                    T.StructField("source", T.StringType(), True),
                    T.StructField("declared_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic opaque-binary corpus derived from documents."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
            .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
            .otherwise(F.lit("video"))
            .alias("kind"),
            F.col("source").alias("source"),
            F.col("n_chars").alias("declared_bytes"),
        ).alias("meta"),
    )


def decode_image(content: bytes, fake: bool = False) -> tuple[int, int]:
    """Stub decoder: returns (width, height). Real implementation needs
    an image library not present in this container."""
    if fake:
        h = hashlib.md5(content).digest()
        return (h[0] % 64 + 1, h[1] % 64 + 1)
    raise NotImplementedError(
        "image decoding requires an image library (PIL/opencv) — "
        "not available in this environment; pass fake=True for the "
        "deterministic test double"
    )


def decode_audio(content: bytes, fake: bool = False) -> float:
    """Stub decoder: returns duration seconds."""
    if fake:
        return len(content) / 1000.0
    raise NotImplementedError(
        "audio decoding requires an audio library — pass fake=True "
        "for the deterministic test double"
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("kind", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_md5", T.StringType(), True),
        T.StructField("meta_consistent", T.BooleanType(), True),
    ]
)


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas feature extractor — the real Arrow plumbing: bytes
    arrive as a pandas column of bytes objects, one DataFrame per Arrow
    batch, and only projected columns are transferred."""
    for pdf in batches:
        content = pdf["content"]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": content.map(len).astype("int64"),
                "content_md5": content.map(
                    lambda b: hashlib.md5(b).hexdigest()
                ),
                "meta_consistent": content.map(len).astype("int64")
                == pdf["declared_bytes"].astype("int64"),
            }
        )


@register(
    "multimodal_features",
    oracle="SELECT doc_id AS media_id, "
    "CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' "
    "ELSE 'video' END AS kind, "
    "CAST(length(text) AS BIGINT) AS n_bytes, md5(text) AS content_md5, "
    "length(text) = n_chars AS meta_consistent FROM documents",
    doc="Binary-column feature extraction over mapInPandas (X5/U1): "
    "Arrow-batched bytes → per-item features. The oracle recomputes "
    "the same features relationally, proving the binary round-trip is "
    "lossless. At 100 TB the decode stage is the only Python hop, "
    "batched and column-pruned.",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_df(spark, sf_dir).select(
        "media_id",
        "content",
        F.col("meta.kind").alias("kind"),
        F.col("meta.declared_bytes").alias("declared_bytes"),
    )
    return m.mapInPandas(extract_features, _FEATURE_SCHEMA)


@register(
    "multimodal_dedup",
    oracle="WITH m AS (SELECT doc_id AS media_id, md5(text) AS content_md5 "
    "FROM documents), r AS (SELECT *, row_number() OVER "
    "(PARTITION BY content_md5 ORDER BY media_id) AS rn, "
    "CAST(count(*) OVER (PARTITION BY content_md5) AS BIGINT) AS n_copies "
    "FROM m) SELECT media_id, content_md5, n_copies FROM r WHERE rn = 1",
    doc="Exact dedup over the opaque binary column (X1×X5): md5 of "
    "bytes, first media_id wins — media dedup without ever decoding.",
)
def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    m = media_df(spark, sf_dir).select(
        "media_id", F.md5("content").alias("content_md5")
    )
    w = Window.partitionBy("content_md5").orderBy("media_id")
    return (
        m.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_copies", F.count(F.lit(1)).over(Window.partitionBy("content_md5"))
        )
        .filter(F.col("rn") == 1)
        .select("media_id", "content_md5", "n_copies")
    )


@register(
    "llm_median_tokens",
    oracle="WITH t AS (SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) "
    "AS n_tokens FROM documents) "
    "SELECT lang, median(n_tokens) AS median_tokens FROM t GROUP BY lang",
    doc="Grouped-aggregate pandas UDF (U3): per-language median token "
    "count — an order statistic built-ins can't stream, computed as an "
    "Arrow-batched UDAF.",
)
def q_llm_median_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(v.median())

    d = load_table(spark, sf_dir, "documents").select(
        "lang", F.size(F.split("text", " ", -1)).cast("long").alias("n_tokens")
    )
    return d.groupBy("lang").agg(median_udaf("n_tokens").alias("median_tokens"))
