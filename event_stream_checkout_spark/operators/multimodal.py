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
import math
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
    """Deterministic opaque-binary corpus derived from documents.

    NULL text = a MISSING media object: dropped at this ingestion
    boundary (every oracle filters identically), exactly as a blob
    store returns no object for a dangling reference.  Without the
    guard the decode kernels receive None payloads and throw — the
    null-sweep --text finding.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
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


def decode_image_dims(content: bytes) -> tuple[str, int, int]:
    """REAL container-header parse for the three formats whose
    dimensions live at fixed offsets (r8 — pure stdlib, no image
    library): returns (format, width, height).

    - PNG: 8-byte signature, then the IHDR chunk — width/height are
      big-endian u32 at offsets 16/20 (PNG spec §11.2.2).
    - GIF: 'GIF87a'/'GIF89a', logical-screen w/h little-endian u16
      at offsets 6/8.
    - BMP: 'BM', BITMAPINFOHEADER w/h little-endian i32 at 18/22.

    Pixel DECODING still needs a codec library and stays behind the
    NotImplementedError contract — but dimension extraction, the
    metadata a curation pipeline filters on (min-resolution gates,
    aspect-ratio buckets), is real."""
    import struct

    if content[:8] == b"\x89PNG\r\n\x1a\n" and content[12:16] == b"IHDR":
        w, h = struct.unpack(">II", content[16:24])
        return ("png", w, h)
    if content[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", content[6:10])
        return ("gif", w, h)
    if content[:2] == b"BM" and len(content) >= 26:
        w, h = struct.unpack("<ii", content[18:26])
        return ("bmp", w, abs(h))  # negative height = top-down rows
    raise NotImplementedError(
        "unrecognized image container (PNG/GIF/BMP headers supported; "
        "full decode requires an image library)"
    )


def decode_image(content: bytes, fake: bool = False) -> tuple[int, int]:
    """Image decode: (width, height).  Real path parses PNG/GIF/BMP
    container headers (decode_image_dims); the deterministic fake
    remains the oracle path for the synthetic text-payload corpus."""
    if fake:
        h = hashlib.md5(content).digest()
        return (h[0] % 64 + 1, h[1] % 64 + 1)
    _, w, h = decode_image_dims(content)
    return (w, h)


def decode_wav(content: bytes):
    """REAL audio decode for RIFF/WAVE PCM via stdlib ``wave`` (r7
    verdict item 5 — no new dependency class): returns (sample_rate,
    n_channels, int64 numpy array of interleaved samples).  8-bit PCM
    is unsigned-centered (−128), 16-bit is little-endian signed —
    the two layouts the WAV spec mandates for integer PCM.  Other
    sample widths / compressed codecs stay behind the contracted
    NotImplementedError."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(content), "rb") as w:
        sr = w.getframerate()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 1:
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
    elif sw == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.int64)
    else:
        raise NotImplementedError(
            f"only 8/16-bit integer PCM WAV is supported (got "
            f"sampwidth={sw})"
        )
    return sr, ch, samples


def is_wav(content: bytes) -> bool:
    return content[:4] == b"RIFF" and content[8:12] == b"WAVE"


def decode_audio(content: bytes, fake: bool = False) -> float:
    """Audio decode: duration in seconds.  Real path handles WAV PCM
    (stdlib ``wave``); the deterministic fake remains the oracle path
    for the synthetic text-payload corpus."""
    if fake:
        return len(content) / 1000.0
    if is_wav(content):
        sr, ch, samples = decode_wav(content)
        return (len(samples) // ch) / float(sr)
    raise NotImplementedError(
        "non-WAV audio decoding requires an audio library — pass "
        "fake=True for the deterministic test double"
    )


def resize_image(
    content: bytes, width: int, height: int, fake: bool = False
) -> bytes:
    """Stub resize: returns the re-encoded image bytes at (width,
    height).  The deterministic fake emulates the size/aspect contract
    (output length scales with the requested pixel count) so pipeline
    plumbing — batch shapes, byte-column round-trips, size accounting —
    is testable without an image library."""
    if fake:
        target = max(1, (width * height) // 8)
        reps = target // max(len(content), 1) + 1
        return (content * reps)[:target]
    raise NotImplementedError(
        "image resizing requires an image library (PIL/opencv) — "
        "pass fake=True for the deterministic test double"
    )


FRAME_CHARS = 64     # fake frame = 64 decoded characters
FRAME_STRIDE = 2     # sample every 2nd frame


def sample_frames(
    content: bytes,
    frame_chars: int = FRAME_CHARS,
    stride: int = FRAME_STRIDE,
    fake: bool = False,
) -> list[tuple[int, str]]:
    """Stub video frame sampler: returns [(frame_idx, frame_payload)].

    A real implementation seeks keyframes via a video library; the
    deterministic fake treats the UTF-8 decoded payload as a frame
    reel (``frame_chars`` characters per frame) and samples every
    ``stride``-th frame — CHARACTER slicing, so the DuckDB oracle can
    reproduce frames exactly with substring() regardless of multibyte
    content."""
    if not fake:
        raise NotImplementedError(
            "video decoding requires a video library — pass fake=True "
            "for the deterministic test double"
        )
    text = content.decode("utf-8")
    out = []
    for idx in range(0, max((len(text) + frame_chars - 1) // frame_chars, 0)):
        if idx % stride == 0:
            out.append((idx, text[idx * frame_chars : (idx + 1) * frame_chars]))
    return out


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
    "length(text) = n_chars AS meta_consistent FROM documents "
    "WHERE text IS NOT NULL",
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
    "FROM documents WHERE text IS NOT NULL), r AS (SELECT *, row_number() OVER "
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


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("frame_idx", T.LongType(), True),
        T.StructField("frame_md5", T.StringType(), True),
        T.StructField("frame_chars", T.LongType(), True),
    ]
)


def _sample_frame_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for media_id, content in zip(pdf["media_id"], pdf["content"]):
            for idx, frame in sample_frames(content, fake=True):
                rows.append(
                    (
                        int(media_id),
                        int(idx),
                        hashlib.md5(frame.encode("utf-8")).hexdigest(),
                        len(frame),
                    )
                )
        yield pd.DataFrame(
            rows, columns=["media_id", "frame_idx", "frame_md5", "frame_chars"]
        )


@register(
    "multimodal_frame_sample",
    oracle=f"WITH m AS (SELECT doc_id AS media_id, text FROM documents "
    "WHERE doc_id % 3 = 2 AND text IS NOT NULL), "
    "f AS (SELECT media_id, i AS frame_idx, "
    f"  substring(text, i * {FRAME_CHARS} + 1, {FRAME_CHARS}) AS frame "
    "  FROM m, UNNEST(generate_series(0, "
    f"    CAST(ceil(len(text) / {FRAME_CHARS}.0) AS BIGINT) - 1)) AS t(i) "
    f"  WHERE i % {FRAME_STRIDE} = 0) "
    "SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx, "
    "md5(frame) AS frame_md5, CAST(len(frame) AS BIGINT) AS frame_chars "
    "FROM f",
    doc="Video frame sampling over mapInPandas (X5/U1): every "
    f"{FRAME_STRIDE}nd frame of each 'video' item (kind derivation "
    "doc_id%3=2), emitted as (frame_idx, md5, size) — the fan-out "
    "shape (1 media row → N frame rows) with Arrow-batched decode. "
    "The fake decoder slices decoded characters, so the oracle "
    "reproduces frames exactly with substring(); a real build swaps "
    "sample_frames(fake=False) in without touching the plan. Frames "
    "stay partition-local (no shuffle) until a downstream op keys "
    "them.",
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_df(spark, sf_dir).filter(F.col("meta.kind") == "video").select(
        "media_id", "content"
    )
    return m.mapInPandas(_sample_frame_batches, _FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# X5d: audio windowed-RMS energy over mapInPandas
# ---------------------------------------------------------------------------

AUDIO_WINDOW = 256  # fake PCM samples (bytes) per analysis window


def _audio_window_batches(batches, codec: str = "bytes"):
    """mapInPandas kernel: PCM samples → per-window RMS energy.

    ``codec="bytes"`` is the deterministic fake (each payload byte is
    one unsigned 8-bit sample) — the oracle path for the synthetic
    text corpus.  ``codec="wav"`` is the REAL path: payloads are
    RIFF/WAVE PCM parsed by stdlib ``wave`` (decode_wav; mono only —
    windowed RMS of interleaved channels would mix channels within a
    window).  Both paths feed the SAME windowing/RMS math: integer
    sums, one exact double division, one correctly-rounded sqrt —
    the codec swaps without touching the plan, which is the whole
    point of the kernel contract."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        rows = []
        for media_id, content in zip(pdf["media_id"], pdf["content"]):
            if codec == "wav":
                _sr, ch, samples = decode_wav(bytes(content))
                if ch != 1:
                    raise NotImplementedError(
                        "windowed RMS expects mono WAV (downmix first)"
                    )
            else:
                samples = np.frombuffer(content, dtype=np.uint8).astype(
                    np.int64
                )
            for w in range(0, len(samples), AUDIO_WINDOW):
                chunk = samples[w : w + AUDIO_WINDOW]
                rms = math.sqrt(
                    float(int((chunk * chunk).sum())) / float(len(chunk))
                )
                rows.append((media_id, w // AUDIO_WINDOW, len(chunk), rms))
        yield pd.DataFrame(
            rows, columns=["media_id", "window_idx", "n_samples", "rms"]
        )


_AUDIO_SCHEMA = (
    "media_id long, window_idx long, n_samples long, rms double"
)


def audio_windows(media: DataFrame, codec: str = "bytes") -> DataFrame:
    """Windowed-RMS over a (media_id, content) frame with a pluggable
    codec — ``"bytes"`` (deterministic fake, oracle path) or ``"wav"``
    (real RIFF/WAVE PCM via stdlib wave).  Same plan either way:
    Arrow-batched mapInPandas, windows partition-local, no shuffle."""
    return media.mapInPandas(
        lambda it: _audio_window_batches(it, codec), _AUDIO_SCHEMA
    )


@register(
    "multimodal_audio_windows",
    oracle=f"WITH m AS (SELECT doc_id AS media_id, text FROM documents "
    "WHERE doc_id % 3 = 1 AND text IS NOT NULL), "
    "s AS (SELECT media_id, i - 1 AS pos, "
    "  ord(substring(text, i, 1)) AS v "
    "  FROM m, UNNEST(generate_series(1, len(text))) AS t(i)), "
    f"w AS (SELECT media_id, pos // {AUDIO_WINDOW} AS window_idx, "
    "  CAST(count(*) AS BIGINT) AS n_samples, "
    "  CAST(sum(v * v) AS BIGINT) AS ss FROM s GROUP BY 1, 2) "
    "SELECT media_id, CAST(window_idx AS BIGINT) AS window_idx, "
    "n_samples, sqrt(CAST(ss AS DOUBLE) / n_samples) AS rms FROM w",
    doc="Audio windowed-RMS energy over mapInPandas (X5d/U1): each "
    "'audio' item's fake-PCM payload (1 byte = 1 unsigned sample; a "
    "real codec swaps in behind the same kernel signature) is cut "
    f"into {AUDIO_WINDOW}-sample windows and scored sqrt(mean(s²)) — "
    "the silence-detection / loudness-normalization primitive, and "
    "the 1-row→N-windows Arrow fan-out shape for audio. Windows stay "
    "partition-local (no shuffle); numerically the kernel is integer "
    "sums + one exact division + one correctly-rounded sqrt, which "
    "is why the DuckDB oracle reproduces the doubles bit-for-bit "
    "from the source characters (ASCII corpus: byte value = char "
    "code).",
)
def q_multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_df(spark, sf_dir).filter(F.col("meta.kind") == "audio").select(
        "media_id", "content"
    )
    return audio_windows(m, codec="bytes")
