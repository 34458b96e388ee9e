"""LLM-curation waves 5-10: relevance ranking (BM25), weighted
sampling without replacement (Efraimidis–Spirakis A-ES), edit-distance
near-dup detection with banded length blocking, BPE-style phrase-merge
training, deterministic train/val/test splits, and unigram
perplexity-proxy filtering.

These extend the §2.10 curation family: BM25 is the lexical-retrieval
baseline every data-selection pipeline ranks against, A-ES is THE
distributed way to draw a weighted sample in one pass (keys are
independent per row — no sequential draw state), edit-distance catches
the character-level near-dups that token-set methods (minhash/simhash/
jaccard) miss, the merge loop is how subword/phrase vocabularies are
learned, hash-splits are the leak-proof dataset partitioning, and
perplexity is the canonical model-based quality signal.

Cross-engine float policy for ``ln``: unlike +,-,*,/,sqrt, libm ``log``
is not guaranteed correctly rounded, so a raw ln can differ by 1 ulp
between the JVM and DuckDB.  Every ln here is therefore quantized
immediately (floor(x*1e6+0.5) or floor(x*1e9+0.5) — integer-valued
doubles, exact) before entering any comparison or further arithmetic;
downstream ops are the bit-stable ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum, sql_dsum
from ..registry import register
from ..tables import load_table


# ---------------------------------------------------------------------------
# BM25 relevance ranking
# ---------------------------------------------------------------------------

_BM25_TERMS = ("join", "vector", "stream")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20

_SQL_TERMS = ", ".join(f"'{t}'" for t in _BM25_TERMS)


@register(
    "llm_bm25_topk",
    oracle="WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok"
    " FROM documents), "
    "dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM toks GROUP BY 1), "
    "corpus AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, "
    "  (SELECT CAST(sum(dl) AS DOUBLE) / count(*) FROM dl) AS avgdl "
    "  FROM documents), "
    f"tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf FROM toks "
    f"  WHERE tok IN ({_SQL_TERMS}) GROUP BY 1, 2), "
    "dfreq AS (SELECT tok, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df "
    "  FROM toks "
    f"  WHERE tok IN ({_SQL_TERMS}) GROUP BY 1), "
    "idf AS (SELECT tok, floor(ln(1.0 + (c.n_docs - df + 0.5) / (df + 0.5)) "
    "  * 1000000.0 + 0.5) / 1000000.0 AS idf FROM dfreq, corpus c), "
    "scored AS (SELECT t.doc_id, "
    f"  i.idf * (t.tf * ({_BM25_K1} + 1.0)) / "
    f"  (t.tf + {_BM25_K1} * (1.0 - {_BM25_B} + ({_BM25_B} * d.dl) / c.avgdl))"
    "  AS s FROM tf t JOIN idf i ON t.tok = i.tok "
    "  JOIN dl d ON t.doc_id = d.doc_id CROSS JOIN corpus c) "
    f"SELECT doc_id, {sql_dsum('s')} AS score FROM scored GROUP BY doc_id "
    f"ORDER BY score DESC, doc_id LIMIT {_BM25_TOPK}",
    doc="BM25 top-k relevance ranking (X23): score every document "
    "against a fixed query-term set with the Robertson/Sparck-Jones "
    "BM25 weighting (k1=1.2, b=0.75) and return the top 20 — the "
    "lexical-retrieval baseline for data selection ('find the docs "
    "most about X in the corpus'). All set statistics are corpus "
    "aggregates: df/idf per term (3 rows — broadcast), avgdl a "
    "broadcast scalar; tf is a (doc, term) count whose groupBy "
    "map-side-collapses before the shuffle. Per-doc term scores "
    "reduce through the stable-sum policy and the top-k is a "
    "TakeOrdered (per-partition heaps — no total sort). At 100 TB "
    "nothing here materializes more than the (doc × matched-term) "
    "frame, linear in corpus size; idf's ln is quantized at 1e-6 on "
    "both engines (module docstring).",
)
def q_llm_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ", -1)).alias("tok"))
    dl = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("dl")
    )
    corpus = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs")).crossJoin(
        dl.agg(
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl")
        )
    )
    qtoks = toks.filter(F.col("tok").isin(*_BM25_TERMS))
    tf = qtoks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    dfreq = qtoks.groupBy("tok").agg(
        F.count_distinct("doc_id").cast("double").alias("df")
    )
    idf = dfreq.crossJoin(F.broadcast(corpus)).select(
        "tok",
        (
            F.floor(
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * 1000000.0
                + 0.5
            )
            / 1000000.0
        ).alias("idf"),
    )
    k1, b = F.lit(_BM25_K1), F.lit(_BM25_B)
    scored = (
        tf.join(F.broadcast(idf), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (F.lit(1.0) - b + (b * F.col("dl")) / F.col("avgdl"))
                )
            ).alias("s"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(dsum("s").alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(_BM25_TOPK)
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis A-ES)
# ---------------------------------------------------------------------------

_WS_K = 50


@register(
    "llm_weighted_sample",
    oracle="WITH keyed AS (SELECT doc_id, lang, n_chars, "
    "floor(ln((CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))"
    " AS BIGINT) + 1.0) / 4294967297.0) * 1000000000.0 + 0.5) "
    "/ CAST(n_chars AS DOUBLE) AS sample_key FROM documents) "
    "SELECT doc_id, lang, n_chars, sample_key FROM keyed "
    f"ORDER BY sample_key DESC, doc_id LIMIT {_WS_K}",
    doc="Weighted sampling without replacement (X24, Efraimidis–"
    "Spirakis A-ES): each doc draws a deterministic uniform u from "
    "md5(doc_id) and competes with key ln(u)/w (w = n_chars, "
    "equivalent ordering to the classic u^(1/w)); the top-k keys ARE "
    "a weighted sample without replacement. This is THE distributed "
    "weighted sampler: keys are independent per row (no sequential "
    "draw state), so it is one scan-local expression plus a "
    "TakeOrdered top-k (per-partition heaps — at 100 TB each "
    "partition surfaces ≤k candidates, no total sort, no shuffle of "
    "the corpus). Hash-keyed u makes the sample reproducible across "
    "runs/engines/partitionings, the same property llm_sample_hash "
    "exploits; ln is quantized at 1e-9 (integer-valued double — "
    "exact) before the division, so the key is bit-stable across "
    "engines (module docstring).",
)
def q_llm_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        + 1.0
    ) / 4294967297.0
    key = F.floor(F.log(u) * 1000000000.0 + 0.5) / F.col("n_chars").cast(
        "double"
    )
    return (
        d.select("doc_id", "lang", "n_chars", key.alias("sample_key"))
        .orderBy(F.col("sample_key").desc(), "doc_id")
        .limit(_WS_K)
    )


# ---------------------------------------------------------------------------
# Edit-distance near-dup with banded length blocking
# ---------------------------------------------------------------------------

_ED_MAX_DIST = 8     # pair threshold
_ED_BAND = 20        # n_chars // 20 length bands
_ED_BLOCK_CAP = 50   # drop (lang, band) blocks bigger than this


@register(
    "llm_editdist_dedup",
    oracle="WITH banded AS (SELECT doc_id, lang, text, "
    f"n_chars // {_ED_BAND} AS band FROM documents), "
    "blocks AS (SELECT lang, band FROM banded GROUP BY 1, 2 "
    f"HAVING count(*) <= {_ED_BLOCK_CAP}), "
    "kept AS (SELECT b.* FROM banded b JOIN blocks k "
    "  ON b.lang = k.lang AND b.band = k.band), "
    "probes AS (SELECT doc_id, lang, text, band, "
    "  unnest([band - 1, band, band + 1]) AS probe FROM kept) "
    "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang, "
    "CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist "
    "FROM probes a JOIN kept b "
    "ON a.lang = b.lang AND a.probe = b.band AND a.doc_id < b.doc_id "
    f"WHERE levenshtein(a.text, b.text) <= {_ED_MAX_DIST}",
    doc="Edit-distance near-dup detection (X25): pairs of same-"
    "language documents whose FULL text is within Levenshtein "
    "distance 8 — the character-level near-dup class (typo edits, "
    "small insertions) that token-SET methods (minhash/simhash/"
    "jaccard) are blind to. Quadratic-pair blow-up is contained by "
    "banded length blocking: candidates must share (lang, "
    "n_chars÷20-band) with each left doc probing its own and both "
    "adjacent bands — and because edit distance >= length difference "
    "(pigeonhole), any true pair differs by <=8 chars < the 20-char "
    "band width, so ±1 probing is COMPLETE: zero recall gap (r8, "
    "ADVICE.md r7 — the prior prefix-60 scoring banded on full "
    "length, silently missing prefix-equal/length-divergent pairs; "
    "scoring the full string makes band and score the same metric). "
    "Each pair is tested at most once since the right side's band is "
    "fixed, and blocks larger than 50 docs are dropped entirely (the "
    "jaccard/contamination df-cap stance: an over-dense band is "
    "boilerplate, not near-duplication — documented trade). Join "
    "output is O(Σ block²) with block ≤ cap ⇒ O(corpus · cap), "
    "linear; the DP runs post-join on surviving candidates only, "
    "THRESHOLD-BOUNDED on the engine side (Spark's 3-arg "
    "levenshtein: O(threshold·len) banded DP, not O(len²)) — the "
    "oracle's unbounded levenshtein agrees wherever dist <= 8 by "
    "definition.",
)
def q_llm_editdist_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return editdist_pairs(load_table(spark, sf_dir, "documents"))


def editdist_pairs(d: DataFrame) -> DataFrame:
    """The banded blocked edit-distance pair plan over a
    documents-shaped frame (doc_id, lang, text, n_chars).

    Factored out of the registered query so property tests can drive
    it with an adversarial corpus: B docs crammed into one
    (lang, band) block beyond the cap must produce ZERO pairs (block
    dropped), never O(B²) join output.
    """
    banded = d.select(
        "doc_id",
        "lang",
        "text",
        (F.col("n_chars") / _ED_BAND).cast("long").alias("band"),
    )
    blocks = (
        banded.groupBy("lang", "band")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= _ED_BLOCK_CAP)
        .drop("_n")
    )
    kept = banded.join(blocks, ["lang", "band"])
    probes = kept.select(
        "doc_id",
        "lang",
        "text",
        F.explode(
            F.array(F.col("band") - 1, F.col("band"), F.col("band") + 1)
        ).alias("probe"),
    )
    a, b = probes.alias("a"), kept.alias("b")
    # Threshold-bounded DP: O(threshold·len) per candidate, returns -1
    # past the threshold — equal to the unbounded distance whenever it
    # matters (dist <= _ED_MAX_DIST).
    dist = F.levenshtein(F.col("a.text"), F.col("b.text"), _ED_MAX_DIST)
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.probe") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(dist >= 0)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.lang").alias("lang"),
            dist.cast("long").alias("dist"),
        )
    )


# ---------------------------------------------------------------------------
# X29: BPE-style phrase-merge training (iterative most-frequent-pair)
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 3


def _sql_best(pairs: str, name: str) -> str:
    return (
        f"{name} AS (SELECT pair, cnt FROM {pairs} "
        f"ORDER BY cnt DESC, pair LIMIT 1)"
    )


def _sql_bpe_oracle(sample_pred: str = "TRUE") -> str:
    # docs0 .. docs3: text after 0..3 merges; bestN picked from docsN-1.
    parts = [
        f"docs AS (SELECT doc_id, text FROM documents WHERE {sample_pred})"
    ]
    sel = []
    cur = "docs"
    for r in range(1, _BPE_ROUNDS + 1):
        parts.append(
            f"p{r} AS (SELECT pair, CAST(count(*) AS BIGINT) AS cnt FROM ("
            f"SELECT unnest(list_transform(generate_series(1, "
            f"len(string_split(text, ' ')) - 1), "
            f"i -> string_split(text, ' ')[i] || ' ' || "
            f"string_split(text, ' ')[i + 1])) AS pair FROM {cur}) GROUP BY 1)"
        )
        parts.append(_sql_best(f"p{r}", f"b{r}"))
        nxt = f"m{r}"
        parts.append(
            f"{nxt} AS (SELECT d.doc_id, trim(replace(' ' || d.text || ' ', "
            f"' ' || b.pair || ' ', ' ' || replace(b.pair, ' ', '_') || ' ')) "
            f"AS text FROM {cur} d CROSS JOIN b{r} b)"
        )
        sel.append(
            f"SELECT {r} AS round, pair, cnt FROM b{r}"
        )
        cur = nxt
    return "WITH " + ", ".join(parts) + " " + " UNION ALL ".join(sel)


@register(
    "llm_phrase_merges",
    oracle=_sql_bpe_oracle(),
    doc="BPE-style phrase-merge training (X29): the byte-pair-encoding "
    "training loop lifted to token level — each round counts every "
    "adjacent token pair across the corpus, merges the most frequent "
    "pair into a single unit (deterministic count-then-lexicographic "
    "tiebreak), rewrites the corpus, and repeats; 3 rounds are graded "
    "as (round, pair, count) rows. This is how subword/phrase "
    "vocabularies are actually learned (Sennrich BPE; word2vec "
    "phrase detection), and the distributed shape matters: pair "
    "extraction is a SCAN-LOCAL array zip (slice+transform over the "
    "token array — no explode-join on position), counts collapse "
    "map-side to the vocabulary of pairs, the winner is a 1-row "
    "broadcast, and the rewrite is one scan-local string replace "
    "(left-to-right non-overlapping in both engines — greedy BPE "
    "semantics). Per round: one pair-count shuffle, zero corpus "
    "shuffles. Rounds are LITERAL-WINNER CHAINED (r16, replacing the "
    "r7 parquet staging): each round's 1-row winner collects to the "
    "driver (the bounded-collect class) and the next round's count "
    "pass re-reads the ORIGINAL corpus with the previous merges "
    "applied as literal replace expressions — N scans, zero corpus "
    "writes, versus staging's 2(N-1) extra reads + (N-1) writes. "
    "The trade inverts for thousands-of-merges production training, "
    "where the replace chain grows with N and per-K-rounds "
    "materialization wins again (bpe_rounds docstring).",
)
def q_llm_phrase_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out, _ = bpe_rounds(spark, d, rewrite_last=False)
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


def bpe_rounds(
    spark: SparkSession,
    d: DataFrame,
    rewrite_last: bool,
) -> tuple[list[DataFrame], DataFrame]:
    """The BPE merge loop, shared by the trainer (X29 — merge table
    only), the sampled trainer (X29b) and the encoder (X34 — applies
    ALL rounds and returns the rewritten corpus).  Returns
    ([per-round 1-row winner frames], final corpus frame).

    LITERAL-WINNER chaining (r16, replacing the r8 parquet staging):
    each round is ONE corpus-scan job — count adjacent pairs with the
    previous rounds' merges applied as LITERAL string replaces, take
    the (count desc, pair) winner with a 1-row collect (the bounded
    driver-read class the repo's collect policy allows: same as the
    k-row centroid frames).  The winner then extends the scan-local
    replace chain for the next round.  Nothing is ever written
    between rounds, so the loop costs N corpus scans and ZERO corpus
    writes — the old staging paid 2·(N-1) corpus reads + (N-1)
    full-corpus parquet writes for the same answer (measured 11.9 s →
    see OPTIMIZATION_r16.md).  The replace chain re-applies ≤ N-1
    literal replaces per scan, a scan-local CPU trade that wins for
    the graded fixed N=3; a production trainer running thousands of
    merge rounds would flip back to materializing every K rounds
    (the expression chain and per-round scan both grow with N —
    staging amortizes them; noted in the scale survey).

    Semantics are byte-identical to the staged loop: the same greedy
    left-to-right non-overlapping space-delimited replace, the same
    deterministic (cnt DESC, pair) winner, and the same empty-corpus
    edge — a round with no pairs produces no winner, and the staged
    loop's crossJoin-with-empty made every LATER round (and the
    encoder's corpus) empty, which the early-exit below mirrors."""
    from pyspark.sql import types as T

    win_schema = T.StructType(
        [
            T.StructField("round", T.IntegerType(), False),
            T.StructField("pair", T.StringType(), True),
            T.StructField("cnt", T.LongType(), True),
        ]
    )

    def with_merges(df: DataFrame, merges: list[str]) -> DataFrame:
        txt = F.col("text")
        for pair in merges:
            txt = F.trim(
                F.replace(
                    F.concat(F.lit(" "), txt, F.lit(" ")),
                    F.lit(f" {pair} "),
                    F.lit(" " + pair.replace(" ", "_") + " "),
                )
            )
        if not merges:
            return df
        # Preserve the input column ORDER (ADVICE r16): the staged
        # loop kept (doc_id, text, *passthrough); a positional consumer
        # of the returned corpus must not silently read a moved column.
        return df.select(
            *[txt.alias(c) if c == "text" else c for c in df.columns]
        )

    out: list[DataFrame] = []
    merges: list[str] = []
    emptied = False
    for r in range(1, _BPE_ROUNDS + 1):
        if emptied:
            out.append(spark.createDataFrame([], win_schema))
            continue
        cur = with_merges(d, merges)
        # Token array materialized as a COLUMN before the pair build
        # (r17): the old form closed over the raw split(text)
        # expression inside the transform lambda, so Catalyst
        # re-evaluated the full split — O(tokens) — for EVERY sequence
        # element: O(tokens²) work per document (measured 3.9 s/round
        # at sf0.1 where the whole scan+split costs 0.4 s).  Adjacent
        # pairs are now a zip_with over two slices of the bound
        # column — one split per row, O(tokens) pairs — and the pair
        # ARRAY is itself materialized before the explode so
        # InferFiltersFromGenerate's size>0 guard checks the column
        # instead of re-evaluating the zip_with.  Identical pair list:
        # zip_with(toks[1..n-1], toks[2..n], concat) enumerates the
        # same "tok_i tok_i+1" strings in the same order.
        tok_df = cur.select(F.split("text", " ", -1).alias("_toks"))
        n = F.size(F.col("_toks"))
        pairs_arr = F.when(
            n >= 2,
            F.zip_with(
                F.slice(F.col("_toks"), F.lit(1), n - 1),
                F.slice(F.col("_toks"), F.lit(2), n - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        ).otherwise(F.array().cast("array<string>"))
        counts = (
            tok_df.select(pairs_arr.alias("_parr"))
            .select(F.explode("_parr").alias("pair"))
            .groupBy("pair")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        rows = counts.orderBy(F.col("cnt").desc(), "pair").limit(1).collect()
        if not rows:
            # No pairs anywhere: the staged loop's rewrite-by-crossJoin
            # with an empty winner emptied the corpus, so later rounds
            # and the encoder output are empty too.
            emptied = True
            out.append(spark.createDataFrame([], win_schema))
            continue
        pair, cnt = rows[0]["pair"], rows[0]["cnt"]
        out.append(
            spark.createDataFrame([(r, pair, int(cnt))], win_schema)
        )
        merges.append(pair)
    if emptied:
        final = with_merges(d, merges).limit(0)
    elif rewrite_last:
        final = with_merges(d, merges)
    else:
        final = with_merges(d, merges[:-1])
    return out, final


# ---------------------------------------------------------------------------
# X30: deterministic train/val/test split with per-split stats
# ---------------------------------------------------------------------------

# md5-prefix thresholds: [0, cccc) train ≈ 80%, [cccc, e666) val ≈ 10%,
# [e666, ffff] test ≈ 10% of the 16-bit prefix space.
_SPLIT_TRAIN_HI = "cccc"
_SPLIT_VAL_HI = "e666"


@register(
    "llm_dataset_split",
    oracle="WITH tagged AS (SELECT doc_id, "
    "len(string_split(text, ' ')) AS n_tokens, "
    "CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < "
    f"'{_SPLIT_TRAIN_HI}' THEN 'train' "
    "WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < "
    f"'{_SPLIT_VAL_HI}' THEN 'val' ELSE 'test' END AS split "
    "FROM documents) "
    "SELECT split, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(n_tokens) AS BIGINT) AS total_tokens "
    "FROM tagged GROUP BY 1",
    doc="Deterministic train/val/test split (X30): each doc lands in "
    "train (~80%) / val (~10%) / test (~10%) by its md5(doc_id) "
    "prefix against fixed thresholds — reproducible across runs, "
    "engines, partitionings, and RE-INGESTS (a doc keeps its split "
    "forever, so later pipeline runs can never leak val/test docs "
    "into train: the property rand() splits lack and the reason "
    "hash-splitting is the production standard). Graded as per-split "
    "doc and token totals; the tag is one scan-local expression, the "
    "rollup 3 groups with map-side partials. Composes with "
    "llm_contamination (decontaminate train against the held-out "
    "splits) and llm_token_budget_sample.",
)
def q_llm_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    split = (
        F.when(prefix < _SPLIT_TRAIN_HI, "train")
        .when(prefix < _SPLIT_VAL_HI, "val")
        .otherwise("test")
    )
    return (
        d.select(
            split.alias("split"),
            F.size(F.split("text", " ", -1)).cast("long").alias("n_tokens"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# X31: unigram cross-entropy (perplexity-proxy) quality filter
# ---------------------------------------------------------------------------

_PPL_TOPK = 40


@register(
    "llm_perplexity_proxy",
    oracle="WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) "
    "AS tok FROM documents), "
    "vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM toks "
    "GROUP BY 1), "
    "total AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vocab), "
    "lp AS (SELECT v.tok, floor(ln(CAST(v.cnt AS DOUBLE) / t.n) "
    "* 1000000.0 + 0.5) / 1000000.0 AS logp FROM vocab v, total t), "
    "tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf "
    "FROM toks GROUP BY 1, 2), "
    "doc AS (SELECT tf.doc_id, "
    "CAST(SUM(tf.tf * CAST(floor(-lp.logp * 10000.0 + 0.5) AS DECIMAL(25,0)))"
    " AS DOUBLE) / 10000.0 AS nll, CAST(sum(tf.tf) AS BIGINT) AS n_toks "
    "FROM tf JOIN lp ON tf.tok = lp.tok GROUP BY 1) "
    "SELECT doc_id, n_toks, round(nll / n_toks, 6) AS xent "
    "FROM doc ORDER BY nll / n_toks DESC, doc_id "
    f"LIMIT {_PPL_TOPK}",
    doc="Unigram cross-entropy / perplexity-proxy filter (X31): score "
    "every document by its mean negative log-probability under the "
    "corpus's own unigram language model and surface the 40 most "
    "surprising docs — perplexity filtering, THE quality signal real "
    "LLM data pipelines rank on (docs a corpus LM finds improbable "
    "are boilerplate, noise, or wrong-language). Distributed shape: "
    "the unigram LM is (token, count) — map-side-collapsed, "
    "vocabulary-sized, JOINED (not broadcast — a 100 TB vocab is a "
    "zipf head plus a long tail); the token stream PRE-COLLAPSES to "
    "(doc, token, tf) on the uniform composite key before the "
    "vocabulary join, so the zipf head ('the' in every doc) crosses "
    "the token-keyed shuffle once per DOCUMENT, not once per "
    "occurrence — and AQE skew-split owns what head remains (the "
    "join is 1:1, no expansion); per-token ln is "
    "quantized 1e-6 (module docstring), per-doc sums fixed-point, and "
    "the ranking is TakeOrdered partition heaps. The full-LM upgrade "
    "path swaps the unigram joins for an n-gram table — same plan.",
)
def q_llm_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ", -1)).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n"))
    lp = vocab.crossJoin(F.broadcast(total)).select(
        "tok",
        (
            F.floor(
                F.log(F.col("cnt").cast("double") / F.col("n")) * 1000000.0
                + 0.5
            )
            / 1000000.0
        ).alias("logp"),
    )
    # Pre-collapse to (doc, tok, tf) BEFORE the token-keyed join: the
    # zipf head then ships one row per containing doc, not one per
    # occurrence.  tf × floor(term) ≡ summing the floored term tf
    # times (integer multiplication is exact), so the fixed-point
    # totals are bit-identical to the per-occurrence formulation.
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    nll_q = F.floor(-F.col("logp") * 10000.0 + 0.5).cast("decimal(25,0)")
    doc = (
        tf.join(lp, "tok")
        .groupBy("doc_id")
        .agg(
            (F.sum(F.col("tf") * nll_q).cast("double") / 10000.0).alias(
                "nll"
            ),
            F.sum("tf").alias("n_toks"),
        )
    )
    xent = F.col("nll") / F.col("n_toks")
    return (
        doc.orderBy(xent.desc(), "doc_id")
        .limit(_PPL_TOPK)
        .select("doc_id", "n_toks", F.round(xent, 6).alias("xent"))
    )


# ---------------------------------------------------------------------------
# X31b: bigram-LM cross-entropy (the n-gram upgrade path, proven)
# ---------------------------------------------------------------------------


@register(
    "llm_perplexity_bigram",
    oracle="WITH docs AS (SELECT doc_id, string_split(text, ' ') AS l "
    "FROM documents), "
    "pairs AS (SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM "
    "(SELECT doc_id, unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS z "
    "FROM docs WHERE len(l) >= 2)), "
    "tf AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS tf "
    "FROM pairs GROUP BY 1, 2, 3), "
    "bc AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c12 FROM tf "
    "GROUP BY 1, 2), "
    "cc AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bc GROUP BY 1), "
    "vocab AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM "
    "(SELECT w1 AS tok FROM bc UNION ALL SELECT w2 FROM bc)), "
    "lp AS (SELECT bc.w1, bc.w2, "
    "floor(ln(CAST(bc.c12 + 1 AS DOUBLE) / (cc.c1 + v.v)) * 1000000.0 "
    "+ 0.5) / 1000000.0 AS logp FROM bc JOIN cc ON bc.w1 = cc.w1, vocab v), "
    "doc AS (SELECT tf.doc_id, "
    "CAST(SUM(tf.tf * CAST(floor(-lp.logp * 10000.0 + 0.5) AS DECIMAL(25,0)))"
    " AS DOUBLE) / 10000.0 AS nll, CAST(sum(tf.tf) AS BIGINT) AS n_big "
    "FROM tf JOIN lp ON tf.w1 = lp.w1 AND tf.w2 = lp.w2 GROUP BY 1) "
    "SELECT doc_id, n_big, round(nll / n_big, 6) AS xent "
    "FROM doc ORDER BY nll / n_big DESC, doc_id "
    f"LIMIT {_PPL_TOPK}",
    doc="Bigram-LM cross-entropy filter (X31b — r7 verdict item 2): "
    "the llm_perplexity_proxy docstring claims the n-gram upgrade is "
    "'same plan, different key'; this key PROVES it with an "
    "add-1-smoothed bigram LM, P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V) — "
    "integer-exact counts, ONE double division, ln quantized 1e-6 "
    "(module policy), per-doc fixed-point sums, mean NLL over the "
    "doc's transitions, top-40 most surprising docs by TakeOrdered "
    "heaps. Distributed shape mirrors the unigram exactly, one level "
    "up: bigrams are built SCAN-LOCALLY (zip_with over two slices of "
    "the token array — no positional self-join), pre-collapsed to "
    "(doc, w1, w2, tf) on the uniform composite key so a zipf-hot "
    "bigram ('of the') crosses the model-keyed shuffle once per "
    "CONTAINING DOC, not once per occurrence; the LM table (w1,w2,"
    "c12) is distinct-bigram-sized and derives c(w1) and V from "
    "ITSELF (pinned — three consumers, one corpus pass), never "
    "broadcast (a 100 TB bigram table is zipf head + long tail, it "
    "JOINS on its uniform composite key with AQE skew-split). "
    "Single-token docs have no transitions and drop out in both "
    "engines by construction. V = distinct tokens over both bigram "
    "slots (identical definition both engines); smoothing means "
    "unseen continuations cost ln(c1+V), so the score is defined for "
    "every in-corpus bigram.",
)
def q_llm_perplexity_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    a = F.split("text", " ", -1)
    n = F.size(a)
    pairs = F.zip_with(
        F.slice(a, 1, n - 1),
        F.slice(a, 2, n - 1),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    bg = d.select("doc_id", F.explode(pairs).alias("z")).select(
        "doc_id", F.col("z.w1").alias("w1"), F.col("z.w2").alias("w2")
    )
    # Pre-collapse BEFORE the model join (zipf-skew hardening, same
    # policy as the unigram proxy): tf x floor-quantized term is exact.
    tf = bg.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    # The LM table: distinct-bigram-sized, pinned — it feeds the
    # context counts, the vocabulary scalar, AND the probability join;
    # unpinned, each consumer would re-run the corpus scan + explode.
    c12 = (
        tf.groupBy("w1", "w2")
        .agg(F.sum("tf").alias("c12"))
        .localCheckpoint()
    )
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        c12.select(F.col("w1").alias("tok"))
        .union(c12.select(F.col("w2").alias("tok")))
        .agg(F.countDistinct("tok").alias("v"))
    )
    lp = (
        c12.join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            (
                F.floor(
                    F.log(
                        (F.col("c12") + 1).cast("double")
                        / (F.col("c1") + F.col("v"))
                    )
                    * 1000000.0
                    + 0.5
                )
                / 1000000.0
            ).alias("logp"),
        )
    )
    nll_q = F.floor(-F.col("logp") * 10000.0 + 0.5).cast("decimal(25,0)")
    doc = (
        tf.join(lp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            (F.sum(F.col("tf") * nll_q).cast("double") / 10000.0).alias(
                "nll"
            ),
            F.sum("tf").alias("n_big"),
        )
    )
    xent = F.col("nll") / F.col("n_big")
    return (
        doc.orderBy(xent.desc(), "doc_id")
        .limit(_PPL_TOPK)
        .select("doc_id", "n_big", F.round(xent, 6).alias("xent"))
    )


# ---------------------------------------------------------------------------
# X34: BPE encode — apply the learned merge table to the corpus
# ---------------------------------------------------------------------------


def _sql_bpe_encode_oracle() -> str:
    """The trainer's unrolled CTE chain, extended through the FINAL
    rewrite, with per-doc before/after token counts."""
    parts = ["docs AS (SELECT doc_id, text FROM documents)"]
    cur = "docs"
    for r in range(1, _BPE_ROUNDS + 1):
        parts.append(
            f"p{r} AS (SELECT pair, CAST(count(*) AS BIGINT) AS cnt FROM ("
            f"SELECT unnest(list_transform(generate_series(1, "
            f"len(string_split(text, ' ')) - 1), "
            f"i -> string_split(text, ' ')[i] || ' ' || "
            f"string_split(text, ' ')[i + 1])) AS pair FROM {cur}) GROUP BY 1)"
        )
        parts.append(_sql_best(f"p{r}", f"b{r}"))
        parts.append(
            f"m{r} AS (SELECT d.doc_id, trim(replace(' ' || d.text || ' ', "
            f"' ' || b.pair || ' ', ' ' || replace(b.pair, ' ', '_') || ' ')) "
            f"AS text FROM {cur} d CROSS JOIN b{r} b)"
        )
        cur = f"m{r}"
    return (
        "WITH " + ", ".join(parts) + " SELECT d.doc_id, "
        "CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_before, "
        f"CAST(len(string_split(m.text, ' ')) AS BIGINT) AS n_after "
        f"FROM docs d JOIN {cur} m USING (doc_id)"
    )


@register(
    "llm_bpe_encode",
    oracle=_sql_bpe_encode_oracle(),
    doc="BPE encode (X34): the OTHER half of the X29 trainer — apply "
    "the learned merge table to the corpus, all rounds in learned "
    "order (merge order is load-bearing in BPE: round 2's pair may "
    "contain round 1's merged unit), and report per-doc token counts "
    "before/after. n_before − n_after = merged occurrences, the "
    "compression the vocabulary actually buys per document — the "
    "number a tokenization pipeline budgets context windows with. "
    "Same distributed shape as the trainer (scan-local pair zip, one "
    "pair-vocabulary shuffle per round, literal-chained winners — "
    "r16: no corpus bytes ever staged to disk); the final corpus is "
    "one scan of the original with all merges applied as literal "
    "replaces, and the count compare is a scan-local expression. "
    "In a real "
    "deployment the merge table is learned ONCE on a sample and this "
    "encode pass is the only corpus-wide cost — which is why its "
    "per-round shape (zero corpus shuffles) is what matters at "
    "100 TB.",
)
def q_llm_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .withColumn(
            "n_before", F.size(F.split("text", " ", -1)).cast("long")
        )
    )
    _, final = bpe_rounds(spark, d, rewrite_last=True)
    return final.select(
        "doc_id",
        "n_before",
        F.size(F.split("text", " ", -1)).cast("long").alias("n_after"),
    )


# ---------------------------------------------------------------------------
# X40: maximal-marginal-relevance diversified top-k
# ---------------------------------------------------------------------------

_MMR_LAMBDA = 0.7
_MMR_POOL = 20
_MMR_K = 5

_SQL_DOT = (
    "list_reduce(list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
    "(x, y) -> x + y)"
)
_SQL_NRM = (
    "sqrt(list_reduce(list_transform({a}, "
    "v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))"
)


def _sql_mmr_oracle() -> str:
    lam, mu = _MMR_LAMBDA, 1.0 - _MMR_LAMBDA
    dot_q = _SQL_DOT.format(a="e.embedding", b="q.qv")
    parts = [
        "qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)",
        "scored AS (SELECT e.vec_id, e.embedding, "
        f"{dot_q} / ({_SQL_NRM.format(a='e.embedding')} * "
        f"{_SQL_NRM.format(a='q.qv')}) AS sim "
        "FROM embeddings e, qv q WHERE e.vec_id <> 0)",
        f"cand AS (SELECT * FROM scored ORDER BY sim DESC, vec_id "
        f"LIMIT {_MMR_POOL})",
        "prs AS (SELECT a.vec_id AS va, b.vec_id AS vb, "
        f"{_SQL_DOT.format(a='a.embedding', b='b.embedding')} / "
        f"({_SQL_NRM.format(a='a.embedding')} * "
        f"{_SQL_NRM.format(a='b.embedding')}) AS psim "
        "FROM cand a JOIN cand b ON a.vec_id <> b.vec_id)",
        f"s1 AS (SELECT vec_id, {lam} * sim AS mmr FROM cand "
        f"ORDER BY {lam} * sim DESC, vec_id LIMIT 1)",
    ]
    sel = "SELECT vec_id FROM s1"
    for r in range(2, _MMR_K + 1):
        parts.append(
            f"r{r} AS (SELECT c.vec_id, "
            f"{lam} * c.sim - {mu} * max(p.psim) AS mmr "
            f"FROM cand c JOIN prs p ON p.va = c.vec_id "
            f"AND p.vb IN ({sel}) "
            f"WHERE c.vec_id NOT IN ({sel}) GROUP BY c.vec_id, c.sim)"
        )
        parts.append(
            f"s{r} AS (SELECT vec_id, mmr FROM r{r} "
            f"ORDER BY mmr DESC, vec_id LIMIT 1)"
        )
        sel += f" UNION ALL SELECT vec_id FROM s{r}"
    final = " UNION ALL ".join(
        f"SELECT {r} AS rank, vec_id, round(mmr, 6) AS mmr FROM s{r}"
        for r in range(1, _MMR_K + 1)
    )
    return "WITH " + ", ".join(parts) + " " + final


@register(
    "llm_mmr_topk",
    oracle=_sql_mmr_oracle(),
    doc="Maximal-marginal-relevance diversified retrieval (X40, "
    "Carbonell & Goldstein): greedily pick k=5 results maximizing "
    "λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s) — relevance minus "
    "redundancy against what is already selected — the de-dup "
    "retrieval standard (pure top-k returns five copies of the same "
    "answer; MMR forces coverage). Inherently SEQUENTIAL (each pick "
    "changes the penalty landscape), so like PageRank/BPE/Lloyd it "
    "runs as a fixed-k driver loop of DataFrame ops: the candidate "
    "pool is a TakeOrdered top-20 by exact cosine (one corpus pass), "
    "the 20×20 pairwise-similarity frame is computed ONCE and "
    "pinned, and each round is an anti-join + broadcast penalty "
    "max + 1-row TakeOrdered — all on pool-sized frames; the corpus "
    "is touched exactly once regardless of k. Scores are identical "
    "IEEE expression trees on both engines (the semantic-dedup "
    "cosine stance), rounded 1e-6 at the output; vec_id breaks "
    "ties at every pick so the greedy trajectory is deterministic. "
    "Oracle: the greedy unrolled as k CTE rounds (the BPE-oracle "
    "technique).",
)
def q_llm_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def nrm(a):
        return F.sqrt(dot(a, a))

    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    cand = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "embedding",
            (
                dot(F.col("embedding"), F.col("qv"))
                / (nrm(F.col("embedding")) * nrm(F.col("qv")))
            ).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(_MMR_POOL)
        .localCheckpoint()
    )
    a = cand.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    b = cand.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    prs = (
        a.crossJoin(b)
        .filter(F.col("va") != F.col("vb"))
        .select(
            "va",
            "vb",
            (
                dot(F.col("ea"), F.col("eb"))
                / (nrm(F.col("ea")) * nrm(F.col("eb")))
            ).alias("psim"),
        )
        .localCheckpoint()
    )
    lam, mu = _MMR_LAMBDA, 1.0 - _MMR_LAMBDA
    selected = None
    out = []
    for r in range(1, _MMR_K + 1):
        if selected is None:
            scores = cand.select(
                "vec_id", (F.lit(lam) * F.col("sim")).alias("mmr")
            )
        else:
            pens = (
                prs.join(
                    F.broadcast(selected.withColumnRenamed("vec_id", "vb")),
                    "vb",
                )
                .groupBy("va")
                .agg(F.max("psim").alias("pen"))
            )
            scores = (
                cand.join(selected, "vec_id", "left_anti")
                .join(
                    F.broadcast(pens.withColumnRenamed("va", "vec_id")),
                    "vec_id",
                )
                .select(
                    "vec_id",
                    (
                        F.lit(lam) * F.col("sim") - F.lit(mu) * F.col("pen")
                    ).alias("mmr"),
                )
            )
        best = (
            scores.orderBy(F.col("mmr").desc(), "vec_id")
            .limit(1)
            .localCheckpoint()
        )
        out.append(
            best.select(
                F.lit(r).alias("rank"),
                "vec_id",
                F.round("mmr", 6).alias("mmr"),
            )
        )
        sel_new = best.select("vec_id")
        selected = (
            sel_new if selected is None else selected.union(sel_new)
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


# ---------------------------------------------------------------------------
# X29b: BPE training on a deterministic sample (the production stance)
# ---------------------------------------------------------------------------

_BPE_SAMPLE_HI = "8000"  # md5-prefix < 0x8000 ≈ half the corpus


@register(
    "llm_phrase_merges_sampled",
    oracle=_sql_bpe_oracle(
        sample_pred="substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < "
        f"'{_BPE_SAMPLE_HI}'"
    ),
    doc="BPE training on a deterministic sample (X29b — the r9-queue "
    "item closed early): production BPE trainers never count pairs "
    "over the full corpus — merge statistics converge on a sample "
    "and only the ENCODE pass (X34) is corpus-wide.  This variant "
    "learns the same 3 merge rounds on the md5(doc_id) < 0x8000 "
    "half-corpus (the llm_sample_hash rule: reproducible across "
    "runs, engines, and partitionings — rand() is none of those), "
    "bounding per-round pair-count cost by the sample size while "
    "the plan shape stays X29's exactly (scan-local pair zip, one "
    "pair-vocabulary shuffle per round, literal-chained 1-row "
    "winners — r16).  Graded as the learned (round, pair, "
    "count) table — counts over the SAMPLE, which is the honest "
    "semantics (the merge table is what ships; its counts are "
    "training diagnostics).",
)
def q_llm_phrase_merges_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sampled = d.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
        < _BPE_SAMPLE_HI
    )
    out, _ = bpe_rounds(spark, sampled, rewrite_last=False)
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


# ---------------------------------------------------------------------------
# X71: reciprocal-rank fusion of two retrieval rankings (r13)
# ---------------------------------------------------------------------------

_RRF_C = 60        # the constant from Cormack, Clarke & Buettcher 2009
_RRF_POOL = 100    # per-ranking shortlist (the 100 TB lever: fuse
                   # shortlists, never full rankings)
_RRF_K = 20


def _sql_rrf_oracle() -> str:
    dot_q = _SQL_DOT.format(a="e.embedding", b="q.qv")
    return (
        "WITH qv AS (SELECT embedding AS qv FROM embeddings "
        "WHERE vec_id = 0), "
        "scored AS (SELECT e.vec_id, "
        f"{dot_q} / ({_SQL_NRM.format(a='e.embedding')} * "
        f"{_SQL_NRM.format(a='q.qv')}) AS sim "
        "FROM embeddings e, qv q WHERE e.vec_id <> 0), "
        "dense AS (SELECT vec_id, sim, "
        "CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS BIGINT) "
        f"AS r_dense FROM scored ORDER BY sim DESC, vec_id "
        f"LIMIT {_RRF_POOL}), "
        "prior AS (SELECT d.doc_id AS vec_id, "
        "CAST(row_number() OVER (ORDER BY d.n_chars DESC, d.doc_id) "
        "AS BIGINT) AS r_prior FROM documents d "
        "JOIN embeddings e ON e.vec_id = d.doc_id WHERE d.doc_id <> 0 "
        f"ORDER BY d.n_chars DESC, d.doc_id LIMIT {_RRF_POOL}), "
        "fused AS (SELECT COALESCE(dn.vec_id, pr.vec_id) AS vec_id, "
        "dn.r_dense, pr.r_prior, "
        f"COALESCE(CAST(1 AS DOUBLE) / CAST({_RRF_C} + dn.r_dense "
        "AS DOUBLE), CAST(0 AS DOUBLE)) + "
        f"COALESCE(CAST(1 AS DOUBLE) / CAST({_RRF_C} + pr.r_prior "
        "AS DOUBLE), CAST(0 AS DOUBLE)) AS rrf "
        "FROM dense dn FULL OUTER JOIN prior pr "
        "ON dn.vec_id = pr.vec_id) "
        "SELECT vec_id, CAST(COALESCE(r_dense, 0) AS BIGINT) AS r_dense, "
        "CAST(COALESCE(r_prior, 0) AS BIGINT) AS r_prior, "
        "round(rrf, 6) AS rrf FROM fused "
        # ORDER BY the ROUNDED value explicitly (an unqualified `rrf`
        # resolves to the rounded output alias in DuckDB but the raw
        # column in a naive engine mirror — a boundary pair whose raw
        # sums differ below 1e-6 would then cut differently at the
        # LIMIT; r13 code-review find, fixed before first grade).
        f"ORDER BY round(rrf, 6) DESC, vec_id LIMIT {_RRF_K}"
    )


@register(
    "llm_rrf_fusion",
    oracle=_sql_rrf_oracle(),
    doc="Reciprocal-rank fusion of two retrieval rankings (X71, r13; "
    "Cormack-Clarke-Buettcher RRF, the hybrid-search default in "
    "Elasticsearch/Vespa/OpenSearch): score(d) = Σ_lists 1/(60 + "
    "rank_list(d)), here fusing a DENSE ranking (exact cosine to the "
    "query vector, the X3 scorer) with a document-length PRIOR "
    "ranking (n_chars, the popularity/recency slot) over the same "
    "corpus ids.  Rank-based, so score-scale mismatch between lists "
    "— the thing that breaks weighted-sum fusion — cannot occur.  "
    "Each list is first cut to a 100-item shortlist via TakeOrdered "
    "(distributed top-k, one corpus pass each); ranks are then "
    "row_numbers over the SHORTLIST (a bounded ≤100-row frame, not "
    "a global window), absent-from-list contributes 0 — the "
    "standard shortlist-RRF at scale where full rankings never "
    "materialize.  RRF terms are 1/(60+rank) over INTEGER ranks — "
    "identical IEEE doubles on both engines, rounded 1e-6 at the "
    "output only.  Scale: two TakeOrdereds + a ≤2·100-row outer "
    "join; the corpus is touched exactly twice, no global sort.",
)
def q_llm_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    scored = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            (
                dot(F.col("embedding"), F.col("qv"))
                / (
                    F.sqrt(dot(F.col("embedding"), F.col("embedding")))
                    * F.sqrt(dot(F.col("qv"), F.col("qv")))
                )
            ).alias("sim"),
        )
    )
    # shortlists: TakeOrdered (distributed) cuts the corpus to POOL
    # rows; the rank window then runs over that bounded frame only.
    dense = (
        scored.orderBy(F.col("sim").desc(), "vec_id")
        .limit(_RRF_POOL)
        .withColumn(
            "r_dense",
            F.row_number().over(
                Window.orderBy(F.col("sim").desc(), "vec_id")
            ),
        )
        .select("vec_id", "r_dense")
    )
    prior = (
        d.join(
            e.select("vec_id"), d.doc_id == F.col("vec_id"), "semi"
        )
        .filter(F.col("doc_id") != 0)
        .orderBy(F.col("n_chars").desc(), "doc_id")
        .limit(_RRF_POOL)
        .withColumn(
            "r_prior",
            F.row_number().over(
                Window.orderBy(F.col("n_chars").desc(), "doc_id")
            ),
        )
        .select(F.col("doc_id").alias("pvec_id"), "r_prior")
    )
    term = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(_RRF_C) + F.col(r)).cast("double"), F.lit(0.0)
    )
    fused = (
        dense.join(prior, dense.vec_id == prior.pvec_id, "full_outer")
        .select(
            F.coalesce("vec_id", "pvec_id").alias("vec_id"),
            "r_dense",
            "r_prior",
            (term("r_dense") + term("r_prior")).alias("rrf_raw"),
        )
    )
    return (
        # Cut on the ROUNDED score + vec_id — the same total order the
        # oracle's ORDER BY resolves to (its unqualified `rrf` is the
        # rounded alias).  Ordering by the raw sum would flip a
        # boundary pair whose raw RRF terms differ below the rounding
        # grain (sub-1e-6 spacings are plausible in this score space).
        fused.orderBy(F.round("rrf_raw", 6).desc(), "vec_id")
        .limit(_RRF_K)
        .select(
            "vec_id",
            F.coalesce("r_dense", F.lit(0)).cast("bigint").alias("r_dense"),
            F.coalesce("r_prior", F.lit(0)).cast("bigint").alias("r_prior"),
            F.round("rrf_raw", 6).alias("rrf"),
        )
    )
