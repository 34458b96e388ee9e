"""LLM-data-pipeline operators, wave 3 (round 4): corpus shaping for
incremental ingestion.

Three operations a production training-data pipeline runs on every
ingest batch, absent from wave 1/2 which treated the corpus as a
closed set:

- ``llm_repetition_filter`` — Gopher-style within-document repetition
  signals (the published heuristic family from Rae et al. 2021,
  "Scaling Language Models: ... Gopher", App. A1.1): documents whose
  most-frequent word 2-gram or duplicate-2-gram mass exceeds
  thresholds are low-quality boilerplate/spam. Occurrence-fraction
  variant; all outputs are exact integers + a boolean verdict
  (threshold comparisons are integer cross-multiplications, so there
  is no float to disagree across engines).
- ``llm_incremental_dedup`` — dedup a NEW ingest batch against the
  EXISTING corpus (exact content hash, then minhash-LSH band
  collision), without re-deduping the existing side against itself.
  This is the day-2 shape of corpus dedup: the full-corpus pass
  (llm_near_dedup) runs once; every later ingest only needs
  new-vs-existing.
- ``llm_domain_mix`` — deterministic down-sampling to a target
  per-source mix (equal share here): compute per-source keep
  thresholds from the source counts, then hash-sample each document
  scan-locally. Hash-keyed sampling is reproducible across runs,
  engines, and partitionings.

Reference parity: the reference pipeline has no corpus operators at
all (it is an order-checkout system); these extend the engine's
training-data surface per the build brief, with the same md5-portable
hashing discipline as wave 2 (llm_advanced.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table, with_min_scan_parallelism
from ..scratch import scratch_dir
from .llm_advanced import (
    _BANDS,
    _N_HASHES,
    _SQL_BANDS,
    _SQL_SIGS,
    SQL_GRAMS,
    _sig_columns,
)

# --------------------------------------------------------------------------
# X11: Gopher-style repetition filter
# --------------------------------------------------------------------------

# Occurrence-fraction thresholds (Gopher's are character-fraction; the
# occurrence variant keeps all arithmetic integral):
#   reject if top_2gram_count / total_2grams  > 1/5   (0.20)
#   reject if (total - distinct) / total      > 1/2   (0.50)
_TOP_2GRAM_NUM, _TOP_2GRAM_DEN = 1, 5
_DUP_2GRAM_NUM, _DUP_2GRAM_DEN = 1, 2


@register(
    "llm_repetition_filter",
    oracle="WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws "
    "FROM documents WHERE len(string_split(text, ' ')) >= 2), "
    "g AS (SELECT doc_id, unnest(list_transform("
    "  generate_series(1, len(ws) - 1), "
    "  i -> ws[i] || ' ' || ws[i + 1])) AS gram FROM w), "
    "gc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2) "
    "SELECT doc_id, "
    "CAST(sum(c) AS BIGINT) AS total_2grams, "
    "CAST(count(*) AS BIGINT) AS distinct_2grams, "
    "CAST(max(c) AS BIGINT) AS top_2gram_count, "
    f"(CAST(max(c) AS BIGINT) * {_TOP_2GRAM_DEN} <= "
    f" CAST(sum(c) AS BIGINT) * {_TOP_2GRAM_NUM}) AND "
    f"((CAST(sum(c) AS BIGINT) - CAST(count(*) AS BIGINT)) "
    f" * {_DUP_2GRAM_DEN} <= CAST(sum(c) AS BIGINT) * {_DUP_2GRAM_NUM}) "
    "AS keep FROM gc GROUP BY doc_id",
    doc="Within-document repetition filter (X11, Gopher App. A1.1 "
    "occurrence-fraction variant): a doc is rejected when its most "
    "frequent word 2-gram exceeds 20% of 2-gram occurrences, or when "
    "duplicate 2-gram occurrences (beyond each gram's first) exceed "
    "50%. Plan: explode 2-grams → count per (doc_id, gram) → per-doc "
    "max/sum/distinct — two shuffles, both on uniform high-cardinality "
    "keys; the (doc_id, gram) key cannot skew because one document's "
    "grams spread over its own id. Scales to arbitrarily long "
    "documents (the array-HOF alternative is O(words²) per row). All "
    "outputs integral; the verdict uses integer cross-multiplication, "
    "so cross-engine parity is exact by construction.",
)
def q_llm_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_min_scan_parallelism(
        spark, load_table(spark, sf_dir, "documents")
    )
    d = d.withColumn("_w", F.split("text", " ", -1)).filter(
        F.size("_w") >= 2
    )
    gram = F.transform(
        F.sequence(F.lit(1), F.size("_w") - 1),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("_w"), i),
            F.element_at(F.col("_w"), i + 1),
        ),
    )
    g = d.select("doc_id", F.explode(gram).alias("gram"))
    gc = g.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    total = F.sum("c").cast("long")
    distinct = F.count(F.lit(1)).cast("long")
    top = F.max("c").cast("long")
    return gc.groupBy("doc_id").agg(
        total.alias("total_2grams"),
        distinct.alias("distinct_2grams"),
        top.alias("top_2gram_count"),
        (
            (top * _TOP_2GRAM_DEN <= total * _TOP_2GRAM_NUM)
            & ((total - distinct) * _DUP_2GRAM_DEN <= total * _DUP_2GRAM_NUM)
        ).alias("keep"),
    )


# --------------------------------------------------------------------------
# X12: incremental new-vs-existing dedup
# --------------------------------------------------------------------------

# The ingest split: docs with id % 10 in {8, 9} model the NEW batch
# (~20%), the rest the EXISTING corpus.
_NEW_PRED_SQL = "doc_id % 10 >= 8"

# One oracle serves BOTH X12 variants (in-query and persisted-index):
# the index is a physical layout choice and must not change results —
# same discipline as snk_bucketed, whose oracle joins the raw parquet.
_X12_ORACLE = (
    f"WITH {SQL_GRAMS.strip()}, {_SQL_SIGS}, {_SQL_BANDS}, "
    f"newdocs AS (SELECT doc_id, md5(text) AS h FROM documents "
    f"WHERE {_NEW_PRED_SQL}), "
    f"exhash AS (SELECT DISTINCT md5(text) AS h FROM documents "
    f"WHERE NOT ({_NEW_PRED_SQL})), "
    f"exact AS (SELECT DISTINCT n.doc_id FROM newdocs n "
    "JOIN exhash e ON n.h = e.h), "
    f"nb AS (SELECT * FROM bands WHERE {_NEW_PRED_SQL}), "
    "eb AS (SELECT DISTINCT band_idx, band_key FROM bands "
    f"WHERE NOT ({_NEW_PRED_SQL})), "
    "near AS (SELECT DISTINCT nb.doc_id FROM nb "
    "JOIN eb USING (band_idx, band_key)) "
    "SELECT n.doc_id, CASE WHEN ex.doc_id IS NOT NULL THEN 'exact' "
    "WHEN nr.doc_id IS NOT NULL THEN 'near' ELSE 'unique' END "
    "AS verdict FROM newdocs n "
    "LEFT JOIN exact ex ON n.doc_id = ex.doc_id "
    "LEFT JOIN near nr ON n.doc_id = nr.doc_id"
)


@register(
    "llm_incremental_dedup",
    oracle=_X12_ORACLE,
    doc="Incremental ingest dedup (X12): classify each NEW document "
    "(doc_id % 10 ∈ {8,9} models the ingest batch) against the "
    "EXISTING corpus — 'exact' on md5(text) match, else 'near' on any "
    "shared minhash-LSH band bucket, else 'unique'. Both probes are "
    "LEFT-SEMI shaped (output ≤ new-side rows, so a hot band bucket "
    "cannot blow up quadratically the way a full self-join pair "
    "expansion would — no bucket cap needed here). Signatures are the "
    "same scan-local array_min minhashes as llm_near_dedup; at 100 TB "
    "the existing side's distinct band keys and content hashes are "
    "slim precomputed indexes (4 band rows + 1 hash/doc), not a "
    "corpus re-scan — exactly how a day-2 ingest pipeline holds its "
    "dedup index.",
)
def q_llm_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_min_scan_parallelism(
        spark, load_table(spark, sf_dir, "documents")
    )
    is_new = (F.col("doc_id") % 10) >= 8
    hashed = d.select("doc_id", "text", F.md5("text").alias("h"), is_new.alias("_new"))

    new_docs = hashed.filter(F.col("_new"))
    ex_hashes = hashed.filter(~F.col("_new")).select("h").distinct()
    exact = (
        new_docs.join(ex_hashes, "h", "left_semi")
        .select("doc_id")
        .withColumn("_exact", F.lit(True))
    )

    # Scan-local signatures → 4 (band_idx, band_key) rows per doc.
    from .llm_advanced import _with_grams_array, _sig_columns

    sigs = _with_grams_array(d).select(
        "doc_id", ((F.col("doc_id") % 10) >= 8).alias("_new"), *_sig_columns()
    )
    band_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_idx"),
                F.md5(F.concat(F.col(f"h{a}"), F.col(f"h{b}"))).alias(
                    "band_key"
                ),
            )
            for i, (a, b) in enumerate(_BANDS)
        ]
    )
    bands = sigs.select(
        "doc_id", "_new", F.explode(band_arr).alias("b")
    ).select(
        "doc_id",
        "_new",
        F.col("b.band_idx").alias("band_idx"),
        F.col("b.band_key").alias("band_key"),
    )
    eb = bands.filter(~F.col("_new")).select("band_idx", "band_key").distinct()
    near = (
        bands.filter(F.col("_new"))
        .join(eb, ["band_idx", "band_key"], "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("_near", F.lit(True))
    )

    return (
        new_docs.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("_exact"), "exact")
            .when(F.col("_near"), "near")
            .otherwise("unique")
            .alias("verdict"),
        )
    )


# --------------------------------------------------------------------------
# X12b: incremental dedup against a PERSISTED day-2 index
# --------------------------------------------------------------------------


def _with_grams_guarded(d: DataFrame) -> DataFrame:
    """Attach the `_grams` shingle array WITHOUT dropping short docs
    (unlike _with_grams_array): <3-word documents get an empty array,
    so they keep their exact-hash row in the index but produce no band
    keys — mirroring the oracle, where exhash covers ALL existing docs
    and bands only the shingled ones."""
    d = d.withColumn("_words", F.split("text", " ", -1))
    gram = F.when(
        F.size("_words") >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size("_words") - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("_words"), i),
                F.element_at(F.col("_words"), i + 1),
                F.element_at(F.col("_words"), i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return d.withColumn("_grams", gram)


def _x12_band_keys():
    """The 4 LSH band keys as 'band_idx:md5(h_a||h_b)' strings (the
    single-column physical form of the oracle's (band_idx, band_key)
    pair), with null entries (short docs) filtered out."""
    arr = F.array(
        *[
            F.concat(
                F.lit(f"{i}:"),
                F.md5(F.concat(F.col(f"h{a}"), F.col(f"h{b}"))),
            )
            for i, (a, b) in enumerate(_BANDS)
        ]
    )
    return F.filter(arr, lambda x: x.isNotNull())


def _index_tag(sf_dir: str) -> str:
    """Metastore-name tag for the persisted X12 index tables: source
    fingerprint + PID.  The fingerprint (documents.parquet mtime+size)
    makes staleness structurally impossible — regenerating the source
    at the same path changes the tag, so a long-lived session simply
    never FINDS the old index and rebuilds (ADVICE r6: the bare
    tableExists check silently probed a stale index after a source
    regen).  The PID suffix keeps concurrent sessions from racing one
    metastore name, as with the other sink tables."""
    import hashlib
    import os

    p = os.path.join(sf_dir, "documents.parquet")
    try:
        st = os.stat(p)
        fp = f"{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        fp = "na"
    return (
        hashlib.md5(f"{sf_dir}|{fp}".encode()).hexdigest()[:8]
        + f"_{os.getpid()}"
    )


def incremental_index_table(spark: SparkSession, sf_dir: str) -> str:
    """Day-1 pay-once build of the persisted X12 dedup index: one row
    per (existing doc, band key) carrying the doc's content hash —
    4 slim rows + 1 md5 per document, written bucketBy(8, bkey) +
    sortBy through the same machinery as snk_bucketed (S12). At 100 TB
    the index is ~0.1% of corpus bytes; day-2 ingests probe it without
    ever re-scanning the existing corpus. Source-fingerprinted and
    PID-scoped (_index_tag) so a stale or raced index is never found."""
    import os
    import tempfile

    tag = _index_tag(sf_dir)
    name = f"ecs_dedup_idx_{tag}"
    if spark.catalog.tableExists(name):
        return name
    d = load_table(spark, sf_dir, "documents").filter(~F.expr(_NEW_PRED_SQL))
    sig = _with_grams_guarded(d).select(
        "doc_id", F.md5("text").alias("h"), *_sig_columns()
    )
    idx = sig.select(
        "doc_id", "h", F.explode_outer(_x12_band_keys()).alias("bkey")
    )
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    root = scratch_dir("ecs_dedup_idx", tag)
    (
        # Bucket-aligned pre-partition (r7, as in bucketed_write): one
        # file per bucket instead of tasks×buckets fragments.
        idx.repartition(8, F.col("bkey"))
        .write.bucketBy(8, "bkey")
        .sortBy("bkey")
        .mode("overwrite")
        .option("path", root)
        .saveAsTable(name)
    )
    return name


def batch_sig_rows(spark: SparkSession, sf_dir: str, pred_sql: str) -> DataFrame:
    """An ingest batch's probe-side rows — (doc_id, content hash, band
    keys) — computed in ONE scan-local projection over the batch
    predicate and PINNED (localCheckpoint), so every downstream probe
    plan reads the pinned blocks and never touches documents again.
    The pin scan is the model's stand-in for reading the arriving
    batch file; the existing corpus is not read at all."""
    d = load_table(spark, sf_dir, "documents").filter(F.expr(pred_sql))
    sig = _with_grams_guarded(d).select(
        "doc_id", F.md5("text").alias("h"), *_sig_columns()
    )
    return sig.select(
        "doc_id", "h", _x12_band_keys().alias("bkeys")
    ).localCheckpoint()


def probe_index(idx: DataFrame, new: DataFrame) -> DataFrame:
    """Classify a pinned batch (doc_id, h, bkeys) against an index
    frame (doc_id, h, bkey): 'exact' on content-hash match, 'near' on
    any shared LSH band key, else 'unique'.  The batch (small by
    definition of an ingest) is BROADCAST to both probes, so the index
    streams scan-locally and is never shuffled — the only exchanges
    are the distincts over matched batch doc ids."""
    exact = (
        idx.select(F.col("h").alias("eh"))
        .join(F.broadcast(new.select("doc_id", "h")), F.col("eh") == F.col("h"))
        .select("doc_id")
        .distinct()
        .withColumn("_exact", F.lit(True))
    )
    nb = new.select("doc_id", F.explode("bkeys").alias("bkey"))
    near = (
        idx.select(F.col("bkey").alias("ib"))
        .filter(F.col("ib").isNotNull())
        .join(F.broadcast(nb), F.col("ib") == F.col("bkey"))
        .select("doc_id")
        .distinct()
        .withColumn("_near", F.lit(True))
    )
    return (
        new.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("_exact"), "exact")
            .when(F.col("_near"), "near")
            .otherwise("unique")
            .alias("verdict"),
        )
    )


@register(
    "llm_incremental_dedup_indexed",
    oracle=_X12_ORACLE,
    doc="Incremental ingest dedup against the PERSISTED day-2 index "
    "(X12b): same classification as llm_incremental_dedup — 'exact' on "
    "content-hash match, 'near' on any shared LSH band key, else "
    "'unique' — but the existing side is served ENTIRELY by the slim "
    "index table incremental_index_table() persisted on day 1; the "
    "probe plan contains ZERO scans of the documents corpus (asserted "
    "by tests/test_plan_contracts.py::"
    "test_incremental_dedup_indexed_probes_index_only). The ingest "
    "batch (small by definition of an ingest) is materialized once and "
    "BROADCAST to both probes, so the index is streamed scan-locally "
    "and never shuffled — at 100 TB the only moved bytes are the "
    "batch's hashes and band keys plus the matched doc ids. The oracle "
    "is the same SQL as the in-query variant: a persisted index is a "
    "layout choice and must not change results (snk_bucketed "
    "discipline).",
)
def q_llm_incremental_dedup_indexed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    name = incremental_index_table(spark, sf_dir)
    new = batch_sig_rows(spark, sf_dir, _NEW_PRED_SQL)
    return probe_index(spark.table(name), new)


# --------------------------------------------------------------------------
# X12c: day-N index maintenance — refresh without a corpus rescan
# --------------------------------------------------------------------------

# The day-N split refines _NEW_PRED_SQL's 20% "new" slice into two
# successive ingest days: day 2 appends into the index, day 3 probes
# the refreshed index.
_DAY2_PRED_SQL = "doc_id % 10 = 8"
_DAY3_PRED_SQL = "doc_id % 10 = 9"

_X12_REFRESH_ORACLE = (
    f"WITH {SQL_GRAMS.strip()}, {_SQL_SIGS}, {_SQL_BANDS}, "
    "exh AS (SELECT DISTINCT md5(text) AS h FROM documents "
    "WHERE doc_id % 10 < 8), "
    "exb AS (SELECT DISTINCT band_idx, band_key FROM bands "
    "WHERE doc_id % 10 < 8), "
    f"d2 AS (SELECT doc_id, md5(text) AS h FROM documents "
    f"WHERE {_DAY2_PRED_SQL}), "
    "d2x AS (SELECT DISTINCT d2.doc_id FROM d2 JOIN exh ON d2.h = exh.h), "
    f"d2b AS (SELECT doc_id, band_idx, band_key FROM bands "
    f"WHERE {_DAY2_PRED_SQL}), "
    "d2n AS (SELECT DISTINCT d2b.doc_id FROM d2b "
    "JOIN exb USING (band_idx, band_key)), "
    "d2u AS (SELECT doc_id FROM d2 "
    "WHERE doc_id NOT IN (SELECT doc_id FROM d2x) "
    "AND doc_id NOT IN (SELECT doc_id FROM d2n)), "
    "rh AS (SELECT h FROM exh UNION "
    "SELECT d2.h FROM d2 JOIN d2u USING (doc_id)), "
    "rb AS (SELECT band_idx, band_key FROM exb UNION "
    "SELECT band_idx, band_key FROM d2b JOIN d2u USING (doc_id)), "
    f"d3 AS (SELECT doc_id, md5(text) AS h FROM documents "
    f"WHERE {_DAY3_PRED_SQL}), "
    "d3x AS (SELECT DISTINCT d3.doc_id FROM d3 JOIN rh ON d3.h = rh.h), "
    f"d3b AS (SELECT doc_id, band_idx, band_key FROM bands "
    f"WHERE {_DAY3_PRED_SQL}), "
    "d3n AS (SELECT DISTINCT d3b.doc_id FROM d3b "
    "JOIN rb USING (band_idx, band_key)) "
    "SELECT d3.doc_id, CASE WHEN x.doc_id IS NOT NULL THEN 'exact' "
    "WHEN n.doc_id IS NOT NULL THEN 'near' ELSE 'unique' END AS verdict "
    "FROM d3 LEFT JOIN d3x x ON d3.doc_id = x.doc_id "
    "LEFT JOIN d3n n ON d3.doc_id = n.doc_id"
)


def day2_unique_index_rows(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """The index rows a day-2 ingest CONTRIBUTES: (doc_id, h, bkey) for
    the batch's 'unique' verdicts only ('exact'/'near' docs are dropped
    by dedup, so indexing them would bloat the index with rows that can
    never be the keeper).  Derived entirely from the pinned batch and
    the day-1 index table `name` — the plan contains zero scans of the
    documents corpus (asserted by tests/test_plan_contracts.py)."""
    new2 = batch_sig_rows(spark, sf_dir, _DAY2_PRED_SQL)
    uniq = (
        probe_index(spark.table(name), new2)
        .filter(F.col("verdict") == "unique")
        .select("doc_id")
    )
    return new2.join(uniq, "doc_id").select(
        "doc_id", "h", F.explode_outer("bkeys").alias("bkey")
    )


def refreshed_index_table(spark: SparkSession, sf_dir: str) -> str:
    """Day-3 state of the X12 index: the day-1 index plus the day-2
    batch's unique rows, maintained WITHOUT ever rescanning the
    existing corpus.  The day-1 rows are copied from the already-built
    slim index table (index-sized read, ~0.1% of corpus bytes at
    100 TB) into a separate metastore name — the shared day-1 table
    stays pristine for llm_incremental_dedup_indexed — and the day-2
    contribution is a bucketBy(8, bkey) APPEND, so the refreshed table
    keeps the co-located layout and day-3 probes pay zero exchanges on
    the index side.  At 100 TB the append moves only the batch's own
    slim rows; day-N maintenance cost is O(batch), not O(corpus)."""
    import os
    import tempfile

    tag = _index_tag(sf_dir)
    name = f"ecs_dedup_idx_r_{tag}"
    if spark.catalog.tableExists(name):
        return name
    day1 = incremental_index_table(spark, sf_dir)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    root = scratch_dir("ecs_dedup_idx_r", tag)
    day1_root = scratch_dir("ecs_dedup_idx", tag)
    (
        # Copy day-1 by PATH (a bucketed-table scan would advertise
        # HashPartitioning and elide the aligning repartition — see
        # compacted_index_table), bucket-aligned: one file per bucket.
        spark.read.schema(spark.table(day1).schema)
        .parquet(day1_root)
        .repartition(8, F.col("bkey"))
        .write.bucketBy(8, "bkey")
        .sortBy("bkey")
        .mode("overwrite")
        .option("path", root)
        .saveAsTable(name)
    )
    (
        # The append is also aligned: one file per bucket per ingest
        # day (compaction still bounds the day-N accumulation).
        day2_unique_index_rows(spark, sf_dir, name)
        .repartition(8, F.col("bkey"))
        .write.bucketBy(8, "bkey")
        .sortBy("bkey")
        .mode("append")
        .option("path", root)
        .saveAsTable(name)
    )
    return name


@register(
    "llm_incremental_index_refresh",
    oracle=_X12_REFRESH_ORACLE,
    doc="Day-N index maintenance for incremental dedup (X12c, closing "
    "the r6 verdict's day-N gap): day 2's ingest (doc_id % 10 = 8) is "
    "probed against the day-1 index and its UNIQUE docs' slim rows "
    "(h + 4 band keys) are bucket-appended into the index; day 3's "
    "ingest (doc_id % 10 = 9) then probes the REFRESHED index. "
    "Neither the refresh nor the probe scans the existing corpus "
    "(plan contract: tests/test_plan_contracts.py::"
    "test_index_refresh_no_corpus_scan) — maintenance cost is "
    "O(batch), not O(corpus). The oracle recomputes the same "
    "classification from first principles (existing ∪ day-2 uniques), "
    "so a green grade proves append-refresh ≡ from-scratch rebuild; "
    "the engine-side equivalence is additionally pinned by "
    "tests/test_variant_equivalence.py::test_index_refresh_matches_rebuild.",
)
def q_llm_incremental_index_refresh(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    name = refreshed_index_table(spark, sf_dir)
    new3 = batch_sig_rows(spark, sf_dir, _DAY3_PRED_SQL)
    return probe_index(spark.table(name), new3)


def compacted_index_table(spark: SparkSession, sf_dir: str) -> str:
    """Day-N index COMPACTION: every bucket-append (refreshed_index_
    table) adds one file per touched bucket, so after N ingest days a
    bucket holds N small files and probe-side scan cost creeps up —
    the standard operational decay of any append-maintained layout.
    Compaction rewrites the index bucketBy(8) into a fresh table with
    ONE file per bucket and WITHOUT touching the corpus: the rewrite
    pre-partitions with repartition(8, bkey) — the SAME hash+mod the
    bucketed writer assigns buckets by, so every task holds exactly
    one bucket's rows and emits exactly one file.  (A plain bucketed-
    table scan is NOT bucket-aligned — Spark splits by file unless an
    operator needs the distribution — so the one index-sized exchange
    here is the honest cost.)  At 100 TB that is one read+shuffle+
    write of O(0.1% of corpus bytes), amortized over however many
    ingest days ran since the last compaction.  File
    count asserted by tests/test_scale_features.py::
    test_index_compaction_merges_files; result-invariance by the
    shared oracle and the registered probe below."""
    import os
    import tempfile

    tag = _index_tag(sf_dir)
    name = f"ecs_dedup_idx_c_{tag}"
    if spark.catalog.tableExists(name):
        return name
    src = refreshed_index_table(spark, sf_dir)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    root = scratch_dir("ecs_dedup_idx_c", tag)
    src_root = scratch_dir("ecs_dedup_idx_r", tag)
    # Read the source by PATH, not by table: the bucketed-table scan
    # advertises HashPartitioning(bkey, 8), which lets Catalyst elide
    # the repartition below as already-satisfied — while the actual
    # scan stays file-split, so the write would fragment again.  A
    # plain parquet read has unknown partitioning, so the exchange
    # survives and lands each bucket on exactly one task.
    (
        spark.read.schema(spark.table(src).schema)
        .parquet(src_root)
        .repartition(8, F.col("bkey"))
        .write.bucketBy(8, "bkey")
        .sortBy("bkey")
        .mode("overwrite")
        .option("path", root)
        .saveAsTable(name)
    )
    return name


@register(
    "llm_incremental_index_compact",
    oracle=_X12_REFRESH_ORACLE,
    doc="Day-N index compaction (X12d): the bucket-appended index is "
    "rewritten one-file-per-bucket (repartition(8, bkey) matches the "
    "bucketed writer's hash+mod, so each task emits exactly its "
    "bucket's single file — one index-sized exchange, no corpus "
    "bytes), and day 3 probes the COMPACTED index. "
    "Same oracle as llm_incremental_index_refresh: compaction is a "
    "file-layout operation and must be invisible to results — the "
    "probe over the compacted table must classify identically to the "
    "probe over the fragmented one. Completes the index lifecycle: "
    "build (day 1) → probe → append-refresh (day N) → compact.",
)
def q_llm_incremental_index_compact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    name = compacted_index_table(spark, sf_dir)
    new3 = batch_sig_rows(spark, sf_dir, _DAY3_PRED_SQL)
    return probe_index(spark.table(name), new3)


# --------------------------------------------------------------------------
# X13: deterministic domain mixing
# --------------------------------------------------------------------------

# Hash space: the first 4 hex chars of md5(doc_id) = 65536 buckets.
# The per-source keep threshold floor(65536·min_count/count) is capped
# at 0xffff, so the minimum-count source keeps everything except docs
# whose hash prefix is exactly 'ffff' — the target mix is honored to
# 1/65536 granularity, which is the price of keeping the comparison a
# single scan-local string predicate.
_MIX_BUCKETS = 65536


@register(
    "llm_domain_mix",
    oracle="WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs "
    "FROM documents GROUP BY source), "
    "mm AS (SELECT min(n_docs) AS m FROM c), "
    "t AS (SELECT source, n_docs, CAST(least("
    f"({_MIX_BUCKETS} * m) // n_docs, {_MIX_BUCKETS - 1}) AS BIGINT) "
    "AS threshold FROM c, mm), "
    "k AS (SELECT d.source, count(*) AS n_kept FROM documents d "
    "JOIN t USING (source) "
    "WHERE substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < "
    "lpad(lower(to_hex(threshold)), 4, '0') GROUP BY d.source) "
    "SELECT t.source, t.n_docs, t.threshold, "
    "CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept "
    "FROM t LEFT JOIN k USING (source)",
    doc="Deterministic domain mixing (X13): down-sample every source "
    "to the size of the smallest one (equal-share target mix — the "
    "degenerate uniform case of the weighted mixes used for training "
    "corpora). Per-source keep thresholds are derived from the source "
    "counts (floor(65536·min/count), integer-exact both engines), and "
    "each document is kept by a scan-local md5-prefix comparison — "
    "reproducible across runs, engines, and partitionings. Plan: one "
    "tiny per-source count aggregate (low-cardinality key, map-side "
    "partial collapse), a broadcast of the ~#sources-row threshold "
    "table, then a single filtered scan + final tiny aggregate; the "
    "corpus itself is never shuffled.",
)
def q_llm_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    m = counts.agg(F.min("n_docs").alias("m"))
    thresholds = (
        counts.crossJoin(F.broadcast(m))
        .select(
            "source",
            "n_docs",
            F.least(
                F.floor(F.lit(_MIX_BUCKETS) * F.col("m") / F.col("n_docs")),
                F.lit(_MIX_BUCKETS - 1),
            )
            .cast("long")
            .alias("threshold"),
        )
        # Pin the ~#sources-row threshold table: it feeds BOTH the
        # output projection and the keep-filter broadcast, and without
        # the pin each consumer branch re-runs the corpus count
        # aggregate — one full scan per branch at 100 TB.  Pinned, the
        # corpus is scanned exactly twice (counts, then keep-filter) —
        # the minimum for count-derived thresholds.
        .localCheckpoint()
    )
    hexthr = F.lpad(F.lower(F.hex(F.col("threshold"))), 4, "0")
    kept = (
        d.join(F.broadcast(thresholds), "source")
        .filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4) < hexthr
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_kept"))
    )
    return (
        thresholds.join(F.broadcast(kept), "source", "left")
        .select(
            "source",
            "n_docs",
            "threshold",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        )
    )


# --------------------------------------------------------------------------
# X13b: WEIGHTED domain mixing — per-source target weights
# --------------------------------------------------------------------------

# Non-default integer target weights; unlisted sources get weight 1.
# Integer weights keep every threshold an exact integer expression in
# both engines (a float weight would reintroduce cross-engine rounding).
_MIX_WEIGHTS = {"src0": 3, "src1": 2}
_MIX_DEFAULT_WEIGHT = 1


def domain_mix_weighted(
    spark: SparkSession, sf_dir: str, weights: dict[str, int]
) -> DataFrame:
    """Weighted deterministic domain mixing: keep counts proportional
    to per-source target weights w_s, scaled to the largest total the
    corpus can supply (the limiting source — the one minimizing
    n_s/w_s — is kept whole).  threshold_s = min over all sources t of
    (65536·w_s·n_t) div (w_t·n_s), capped at 65535: the min over t IS
    the limiting-source scale factor, computed as a k²-row self-cross
    of the k-row counts frame so no argmin row selection (and no
    float ratio) is ever needed — every term is exact 64-bit integer
    arithmetic, reproducible across engines.  Equal weights reduce to
    exactly llm_domain_mix's equal-share thresholds (pinned by
    tests/test_variant_equivalence.py).  Plan shape is X13's: one tiny
    per-source count aggregate (pinned — one corpus scan), a k²
    broadcast self-cross of the counts, then the scan-local md5-prefix
    keep filter against the broadcast threshold table; the corpus is
    never shuffled."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    wdf = spark.createDataFrame(
        [(s, int(w)) for s, w in sorted(weights.items())] or [("", 1)],
        "source string, wt long",
    )
    cw = (
        counts.join(F.broadcast(wdf), "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("wt", F.lit(_MIX_DEFAULT_WEIGHT))
            .cast("long")
            .alias("wt"),
        )
        # Pin the k-row counts+weights frame: it feeds both sides of
        # the self-cross AND (via thresholds) the keep filter — without
        # the pin each consumer re-runs the corpus count scan.
        .localCheckpoint()
    )
    a, b = cw.alias("a"), cw.alias("b")
    term = F.expr(
        f"({_MIX_BUCKETS}L * a.wt * b.n_docs) div (b.wt * a.n_docs)"
    )
    thresholds = (
        a.crossJoin(F.broadcast(b))
        .select(
            F.col("a.source").alias("source"),
            F.col("a.n_docs").alias("n_docs"),
            F.col("a.wt").alias("weight"),
            term.alias("term"),
        )
        .groupBy("source", "n_docs", "weight")
        .agg(
            F.least(F.min("term"), F.lit(_MIX_BUCKETS - 1))
            .cast("long")
            .alias("threshold")
        )
    )
    hexthr = F.lpad(F.lower(F.hex(F.col("threshold"))), 4, "0")
    kept = (
        d.join(F.broadcast(thresholds), "source")
        .filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4) < hexthr
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_kept"))
    )
    return thresholds.join(F.broadcast(kept), "source", "left").select(
        "source",
        "n_docs",
        "weight",
        "threshold",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
    )


_WEIGHTS_VALUES = ", ".join(
    f"('{s}', {w})" for s, w in sorted(_MIX_WEIGHTS.items())
)


@register(
    "llm_domain_mix_weighted",
    oracle="WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs "
    "FROM documents GROUP BY source), "
    f"w(source, wt) AS (VALUES {_WEIGHTS_VALUES}), "
    "cw AS (SELECT c.source, c.n_docs, "
    f"CAST(COALESCE(w.wt, {_MIX_DEFAULT_WEIGHT}) AS BIGINT) AS wt "
    "FROM c LEFT JOIN w USING (source)), "
    "t AS (SELECT a.source, a.n_docs, a.wt AS weight, "
    f"CAST(least(min(({_MIX_BUCKETS} * a.wt * b.n_docs) // "
    f"(b.wt * a.n_docs)), {_MIX_BUCKETS - 1}) AS BIGINT) AS threshold "
    "FROM cw a CROSS JOIN cw b GROUP BY 1, 2, 3), "
    "k AS (SELECT d.source, count(*) AS n_kept FROM documents d "
    "JOIN t USING (source) "
    "WHERE substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < "
    "lpad(lower(to_hex(threshold)), 4, '0') GROUP BY d.source) "
    "SELECT t.source, t.n_docs, t.weight, t.threshold, "
    "CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept "
    "FROM t LEFT JOIN k USING (source)",
    doc="WEIGHTED domain mixing (X13b, the real training-mix shape — "
    "r6 verdict item 3): down-sample each source to a kept count "
    "proportional to its target weight (src0 up-weighted 3×, src1 2×, "
    "rest 1), scaled so the limiting source is kept whole. Thresholds "
    "are exact 64-bit integer cross-multiplications over a k²-row "
    "self-cross of the per-source counts (no float ratios, no argmin "
    "row selection); the keep predicate is the same scan-local "
    "md5-prefix comparison as llm_domain_mix, whose equal-share "
    "thresholds are the all-weights-equal degenerate case (pinned by "
    "tests/test_variant_equivalence.py::"
    "test_domain_mix_equal_weights_degenerates).",
)
def q_llm_domain_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return domain_mix_weighted(spark, sf_dir, _MIX_WEIGHTS)
