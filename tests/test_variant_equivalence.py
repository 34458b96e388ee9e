"""Variant-equivalence pins (round 6): where the engine offers two
physical strategies for one semantic operation, their results must be
indistinguishable. The driver's oracle proves each variant against
DuckDB independently; these tests pin them against EACH OTHER locally,
so a divergence is caught even on inputs the oracle never sees.

- X12: in-query incremental dedup vs the persisted-index probe
  (llm_ingest.py) — an index is a layout choice, not a semantics
  choice.
- T1/U5: applyInPandasWithState ledger vs transformWithStateInPandas
  ledger (streaming_analogues.py) — two stateful primitives, one fold.
"""

from __future__ import annotations

from tests.conftest import SF_DIR


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_incremental_dedup_variants_agree(spark):
    from event_stream_checkout_spark.registry import load_all

    reg = load_all()
    a = _rows(reg["llm_incremental_dedup"].fn(spark, SF_DIR))
    b = _rows(reg["llm_incremental_dedup_indexed"].fn(spark, SF_DIR))
    assert len(a) > 0
    assert a == b


def test_index_refresh_matches_rebuild(spark):
    """X12c: the append-maintained day-3 index must classify day-3
    docs identically to a from-scratch index over the same logical
    state (existing corpus ∪ day-2 uniques), computed here directly
    from the corpus without any persisted table."""
    from pyspark.sql import functions as F

    from event_stream_checkout_spark.operators import llm_ingest as li
    from event_stream_checkout_spark.registry import load_all

    reg = load_all()
    a = _rows(reg["llm_incremental_index_refresh"].fn(spark, SF_DIR))

    def idx_rows(pred):
        sig = li.batch_sig_rows(spark, SF_DIR, pred)
        return sig.select(
            "doc_id", "h", F.explode_outer("bkeys").alias("bkey")
        )

    ex_rows = idx_rows("doc_id % 10 < 8")
    new2 = li.batch_sig_rows(spark, SF_DIR, li._DAY2_PRED_SQL)
    d2u = (
        li.probe_index(ex_rows, new2)
        .filter(F.col("verdict") == "unique")
        .select("doc_id")
    )
    d2_rows = new2.join(d2u, "doc_id").select(
        "doc_id", "h", F.explode_outer("bkeys").alias("bkey")
    )
    rebuilt = ex_rows.unionByName(d2_rows)
    new3 = li.batch_sig_rows(spark, SF_DIR, li._DAY3_PRED_SQL)
    b = _rows(li.probe_index(rebuilt, new3))
    assert len(a) > 0
    assert a == b


def test_domain_mix_equal_weights_degenerates(spark):
    """X13b: with all weights equal, the weighted mixer's thresholds
    and kept counts must be exactly llm_domain_mix's equal-share
    result — the weighted formula's degenerate case."""
    from event_stream_checkout_spark.operators import llm_ingest as li
    from event_stream_checkout_spark.registry import load_all

    reg = load_all()
    a = _rows(reg["llm_domain_mix"].fn(spark, SF_DIR))
    b = _rows(
        li.domain_mix_weighted(spark, SF_DIR, {}).drop("weight")
    )
    assert len(a) > 0
    assert a == b


def test_ledger_primitives_agree(spark):
    from event_stream_checkout_spark.registry import load_all
    from event_stream_checkout_spark.streaming.stateful import tws_available

    if not tws_available():  # pragma: no cover - container has the SDK copy
        import pytest

        pytest.skip("no usable protobuf for TWS")
    reg = load_all()
    a = _rows(reg["state_ledger_stream"].fn(spark, SF_DIR))
    b = _rows(reg["state_ledger_tws"].fn(spark, SF_DIR))
    assert len(a) > 0
    assert a == b


def test_scd2_current_slice_equals_upsert(spark):
    """S6/S6b: the SCD2 history's is_current slice and the latest-wins
    upsert are two physical layouts of one semantic state — they must
    agree row-for-row, and the history must satisfy the SCD2
    invariants (exactly one open row per order; closed rows chain
    valid_to = the next version's valid_from)."""
    from event_stream_checkout_spark.registry import load_all

    reg = load_all()
    hist = reg["snk_orders_scd2"].fn(spark, SF_DIR).collect()
    upsert = reg["snk_orders_upsert"].fn(spark, SF_DIR)

    # _rows sorts columns by name: (customer_id, order_id, status).
    current = sorted(
        (r["customer_id"], r["order_id"], r["status"])
        for r in hist
        if r["is_current"]
    )
    assert len(current) > 0
    assert current == _rows(upsert)

    by_order: dict = {}
    for r in hist:
        by_order.setdefault(r["order_id"], []).append(r)
    for oid, rows in by_order.items():
        rows.sort(key=lambda r: r["valid_from"])
        opens = [r for r in rows if r["valid_to"] is None]
        assert len(opens) == 1, (oid, rows)
        assert opens[0] is rows[-1]
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"], (oid, rows)
