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
