"""Round-15 wave: persisted minhash signature/band store (X58b, the
A37b pay-once pattern applied to the banding family).  Semantics and
store-lifecycle checks; the zero-corpus-scan plan contract lives in
test_plan_contracts.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_stream_checkout_spark.registry import load_all
from tests.conftest import SF_DIR

QUERIES = load_all()


def test_minhash_store_build_is_idempotent(spark):
    """Second call returns the SAME table names WITHOUT rebuilding —
    the pay-once contract.  Name equality alone is vacuous (the tag
    is deterministic, so a rebuild-every-call bug would still return
    equal names — r15 review); the on-disk parquet mtimes of the
    store's scratch dirs must also be untouched by the second call."""
    import glob
    import os

    from event_stream_checkout_spark.operators.llm_advanced import (
        _minhash_store_tag,
        minhash_sig_tables,
    )

    t1 = minhash_sig_tables(spark, SF_DIR)

    def mtimes() -> dict[str, float]:
        import tempfile

        tag = _minhash_store_tag(SF_DIR)
        out = {}
        for prefix in ("ecs_mh_sigs", "ecs_mh_buckets"):
            root = os.path.join(tempfile.gettempdir(), f"{prefix}_{tag}")
            for f in glob.glob(os.path.join(root, "*.parquet")):
                out[f] = os.stat(f).st_mtime_ns
        return out

    before = mtimes()
    assert before, "store files not found on disk"
    t2 = minhash_sig_tables(spark, SF_DIR)
    assert t1 == t2
    assert mtimes() == before, "second call rewrote the store"
    for t in t1:
        assert spark.catalog.tableExists(t)


def test_minhash_store_matches_live_pipeline(spark):
    """The persisted signature table is row-identical to the live
    scan-local signature frame, and the stored bucket member lists
    regenerate exactly the live candidate-pair set — the store loses
    nothing the per-query pipeline had."""
    from event_stream_checkout_spark.operators.llm_advanced import (
        _expand_pairs,
        _minhash_sigs,
        _pairs_from_sigs,
        minhash_sig_tables,
    )

    sig_t, bkt_t = minhash_sig_tables(spark, SF_DIR)
    stored = {tuple(r) for r in spark.table(sig_t).collect()}
    live = {tuple(r) for r in _minhash_sigs(spark, SF_DIR).collect()}
    assert stored == live
    stored_pairs = {
        tuple(r)
        for r in _expand_pairs(spark.table(bkt_t)).distinct().collect()
    }
    live_pairs = {
        tuple(r)
        for r in _pairs_from_sigs(_minhash_sigs(spark, SF_DIR)).collect()
    }
    assert stored_pairs == live_pairs


def test_minhash_calib_store_covers_exactly_candidate_docs(spark):
    """The fingerprint-array table holds one row per DISTINCT doc that
    appears in a candidate pair (the gated-scan bound 2·|cand|), each
    array already within-doc distinct — the probe's exact leg needs no
    further dedup and no other doc."""
    from event_stream_checkout_spark.operators.llm_advanced import (
        _expand_pairs,
    )
    from event_stream_checkout_spark.operators.llm_curate import (
        minhash_calib_tables,
    )

    sig_t, bkt_t, fps_t = minhash_calib_tables(spark, SF_DIR)
    cand = _expand_pairs(spark.table(bkt_t)).distinct()
    cand_docs = {
        r["doc_id"]
        for r in cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .collect()
    }
    rows = spark.table(fps_t).collect()
    assert {r["doc_id"] for r in rows} == cand_docs
    assert len(rows) == len(cand_docs), "duplicate doc row in fps store"
    for r in rows:
        assert len(r["fps"]) == len(set(r["fps"])), "fps not distinct"


def test_minhash_persisted_calibration_equals_live(spark):
    """X58b answers the SAME question as X58 from the store alone:
    byte-identical report rows, and a re-run is byte-identical too
    (the store is the single source of truth)."""
    live = [
        tuple(r)
        for r in QUERIES["llm_minhash_calibration"].fn(spark, SF_DIR).collect()
    ]
    q = QUERIES["llm_minhash_calibration_persisted"].fn
    a = [tuple(r) for r in q(spark, SF_DIR).collect()]
    b = [tuple(r) for r in q(spark, SF_DIR).collect()]
    assert a == live
    assert a == b
