#!/usr/bin/env python
"""Materialize a scaled-up replica of a driver testdata dir for bench
scaling measurements (SCALE.md / r4-r5 verdict ask: a measured bench
point above sf0.1, not just plan-shape arguments).

Usage:
    python scripts/make_scaled_sf.py [BASE_DIR] [FACTOR] [OUT_DIR] [SUFFIX]
    # defaults: /root/testdata/sf0.1  10  /tmp/ecs_sf1  "~"

SUFFIX is the word-perturbation prefix for document copies (copy i
suffixes every word with f"{SUFFIX}{i}").  When scaling an ALREADY
scaled dir (sf10 → sf100), pass a prefix disjoint from the one the
base used (e.g. "~a"): re-suffixing with the same "~" would map copy
1's transform of the base's copy 0 onto the base's copy 1 verbatim —
cross-copy EXACT duplicates, turning dedup benches into a synthetic
90%-duplicate corpus instead of scan/shuffle scaling.

Method — replicate, don't resample: FACTOR re-keyed copies of every
fact table, dims copied as-is.  Re-keying keeps the join/group shape
honest at scale:

- orders/lineitem: orderkey shifted per copy (copy i adds i*(max+1)),
  so order→lineitem fan and per-order group sizes stay constant while
  the number of orders grows 10x.  o_custkey is left unchanged
  (customer stays a dim): per-customer density grows, the classic
  "hot dimension" direction.
- events: event_id AND user_id shifted — 10x more users at the same
  per-user event density, so sessionization / per-key state scale in
  KEY COUNT (the 100 TB direction), not in per-key partition size.
- documents: doc_id shifted and every word of copy i>0 suffixed with
  "~i" (n_chars recomputed).  Without the perturbation each doc would
  have 9 exact replicas, and dedup/LSH timings would measure a
  synthetic 90%-duplicate corpus instead of scan/shuffle scaling;
  suffixed copies share no shingles, so cross-copy collisions vanish
  while within-copy near-dup structure is preserved exactly.
- embeddings: vec_id shifted, vectors unchanged (top-k scans are
  row-linear and duplicate-insensitive).

Deterministic (pure column arithmetic, no randomness): two runs
produce byte-identical tables, so bench deltas are never data drift.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DIMS = ["region", "nation", "customer", "supplier", "part"]


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/ecs_sf1"
    suffix = sys.argv[4] if len(sys.argv) > 4 else "~"

    from pyspark.sql import functions as F

    from event_stream_checkout_spark.session import get_session

    spark = get_session("ecs-make-scaled-sf")

    def copies(df, keyed_cols: dict[str, int]):
        """Union of `factor` copies, shifting each column in keyed_cols
        by i*offset for copy i."""
        out_df = None
        for i in range(factor):
            c = df
            for col, off in keyed_cols.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * off))
            out_df = c if out_df is None else out_df.unionByName(c)
        return out_df

    def key_offset(df, col: str) -> int:
        return int(df.agg(F.max(col)).collect()[0][0]) + 1

    # Guard the cross-copy exact-duplicate foot-gun the module
    # docstring warns about (ADVICE r14) BEFORE any write — a refusal
    # must not leave a half-written output dir (r15 review): if the
    # BASE corpus was itself produced by this script, its words
    # already end in "<old_suffix><copy#>"; re-suffixing with the
    # SAME prefix maps copy 1's transform of base-copy 0 onto
    # base-copy 1 verbatim — a synthetic 90%-duplicate corpus.
    # Sample from the TOP of the doc_id range: a scaled base keeps
    # copy 0 unsuffixed, so a head sample would miss the pattern —
    # the highest ids belong to the last (always-suffixed) copy.
    import re

    sample = (
        spark.read.parquet(f"{base}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("text").isNotNull())
        .orderBy(F.col("doc_id").desc())
        .limit(50)
        .collect()
    )
    esc = re.escape(suffix)
    for row in sample:
        last_word = row["text"].rsplit(" ", 1)[-1]
        if re.search(rf"{esc}\d+$", last_word):
            raise SystemExit(
                f"BASE_DIR {base} already carries the word-suffix "
                f"pattern '{suffix}<copy#>' (sample word "
                f"{last_word!r}): re-scaling with the same SUFFIX "
                "creates cross-copy EXACT duplicates.  Pass a "
                "disjoint suffix alphabet (e.g. '~a') as argv[4]."
            )

    os.makedirs(out, exist_ok=True)
    for t in DIMS:
        spark.read.parquet(f"{base}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")

    orders = spark.read.parquet(f"{base}/orders.parquet")
    o_off = key_offset(orders, "o_orderkey")
    copies(orders, {"o_orderkey": o_off}).write.mode("overwrite").parquet(
        f"{out}/orders.parquet"
    )
    lineitem = spark.read.parquet(f"{base}/lineitem.parquet")
    copies(lineitem, {"l_orderkey": o_off}).write.mode("overwrite").parquet(
        f"{out}/lineitem.parquet"
    )

    events = spark.read.parquet(f"{base}/events.parquet")
    copies(
        events,
        {
            "event_id": key_offset(events, "event_id"),
            "user_id": key_offset(events, "user_id"),
        },
    ).write.mode("overwrite").parquet(f"{out}/events.parquet")

    docs = spark.read.parquet(f"{base}/documents.parquet")
    d_off = key_offset(docs, "doc_id")
    scaled_docs = None
    for i in range(factor):
        c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * d_off))
        if i > 0:
            c = c.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split("text", " ", -1),
                        lambda w: F.concat(w, F.lit(f"{suffix}{i}")),
                    ),
                    " ",
                ),
            ).withColumn("n_chars", F.length("text").cast("long"))
        scaled_docs = c if scaled_docs is None else scaled_docs.unionByName(c)
    scaled_docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = spark.read.parquet(f"{base}/embeddings.parquet")
    copies(emb, {"vec_id": key_offset(emb, "vec_id")}).write.mode(
        "overwrite"
    ).parquet(f"{out}/embeddings.parquet")

    for t in DIMS + ["orders", "lineitem", "events", "documents", "embeddings"]:
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n}")
    spark.stop()


if __name__ == "__main__":
    main()
