"""True streaming keyed mutable state (SURVEY.md §2.8 T1, §2.9 U5):
the inventory ledger as a ``transformWithStateInPandas`` stateful
processor — Spark's replacement for the reference's
``SELECT ... FOR UPDATE`` row-lock loop (src/order_processor/
app.py:85-94).

Each product's remaining stock lives in per-key ValueState inside the
state store (RocksDB provider); items arrive as a keyed stream and are
folded sequentially *within* a key while all keys process in parallel —
single-writer discipline by construction, no locks.

This is the streaming twin of ``pipeline.settle_replay_items``; the
foreachBatch shell (streaming/pipeline.py) remains the default because
it also gives whole-order atomicity, but this operator is the right
primitive when the stream is a pure per-key ledger (metering, quotas,
token buckets) at 100 TB: state is partitioned with the stream, scales
with executors, and checkpoints incrementally.

Ledger vs chunked batch replay (``checkout.q_state_inventory_replay``)
— SAME per-item semantics, pinned by
tests/test_scale_features.py::test_ledger_stream_matches_batch_replay:

- LIVE stream → ledger: O(1) state per key in the state store,
  incremental checkpoints, no history retained, per-key sequential /
  cross-key parallel by construction.
- BOUNDED historical fold → chunked replay: one ranked shuffle over
  the history, no state store to operate, the whole result re-derives
  from inputs (easier to audit/backfill), bounded memory via rank
  chunks.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from ..pipeline import INVENTORY_SEED
from ..session import configure

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("product_id", T.StringType(), True),
        T.StructField("event_seq", T.LongType(), True),
        T.StructField("quantity", T.LongType(), True),
        T.StructField("item_ok", T.BooleanType(), True),
        T.StructField("remaining", T.LongType(), True),
    ]
)

ITEM_STREAM_SCHEMA = (
    "product_id string, event_seq long, quantity long, ts timestamp_ntz"
)


class InventoryLedger(StatefulProcessor):
    """Per-product remaining-stock ValueState; greedy sequential fold
    in (ts, event_seq) order within each micro-batch."""

    def __init__(self, seed: dict[str, int] | None = None):
        self._seed = seed if seed is not None else {
            pid: qty for pid, _, qty in INVENTORY_SEED
        }

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._remaining = handle.getValueState(
            "remaining", T.StructType([T.StructField("value", T.LongType())])
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (product_id,) = key
        if self._remaining.exists():
            remaining = int(self._remaining.get()[0])
        else:
            # Unknown product → -1 sentinel: always insufficient,
            # mirroring the reference's `not result` branch (app.py:88).
            remaining = int(self._seed.get(product_id, -1))
        pdf = pd.concat(list(rows), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_seq"], kind="stable")
        out = []
        for seq, q in zip(pdf["event_seq"], pdf["quantity"]):
            ok = 0 <= int(q) <= remaining
            if ok:
                remaining -= int(q)
            out.append((product_id, int(seq), int(q), ok, remaining))
        self._remaining.update((remaining,))
        yield pd.DataFrame(
            out, columns=["product_id", "event_seq", "quantity", "item_ok", "remaining"]
        )

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """transformWithStateInPandas needs protobuf for its state-server
    protocol; some environments (including this container) ship a
    broken google.protobuf. Detect instead of crashing the worker."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def inventory_ledger_stream_tws(
    spark: SparkSession, items_dir: str, seed: dict[str, int] | None = None
) -> DataFrame:
    """Wire a JSON item stream through the TWS stateful ledger
    (requires a working protobuf install — see tws_available)."""
    configure(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    stream = (
        spark.readStream.schema(ITEM_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(items_dir)
    )
    return stream.groupBy("product_id").transformWithStateInPandas(
        statefulProcessor=InventoryLedger(seed),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


# ---------------------------------------------------------------------------
# applyInPandasWithState form — same semantics, Arrow-only protocol
# (works everywhere PySpark does; the operational default here).
# ---------------------------------------------------------------------------

STATE_SCHEMA = T.StructType([T.StructField("remaining", T.LongType())])


def inventory_ledger_stream(
    spark: SparkSession,
    items_dir: str,
    seed: dict[str, int] | None = None,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Per-product ValueState fold via applyInPandasWithState (U5).

    ``max_files_per_trigger=1`` (default) makes each staging file its
    own micro-batch — the multi-batch shape used by the crash-replay
    tests.  Pass ``None`` to let one availableNow batch drain the
    whole directory (per-key staging: a key's rows all live in one
    file, so the in-batch per-key sort fixes the fold order with no
    cross-batch coupling).
    """
    configure(spark)
    seed_map = seed if seed is not None else {
        pid: qty for pid, _, qty in INVENTORY_SEED
    }

    def ledger(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (product_id,) = key
        if state.exists:
            (remaining,) = state.get
            remaining = int(remaining)
        else:
            remaining = int(seed_map.get(product_id, -1))
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_seq"], kind="stable")
        out = []
        for seq, q in zip(pdf["event_seq"], pdf["quantity"]):
            ok = 0 <= int(q) <= remaining
            if ok:
                remaining -= int(q)
            out.append((product_id, int(seq), int(q), ok, remaining))
        state.update((remaining,))
        yield pd.DataFrame(
            out,
            columns=["product_id", "event_seq", "quantity", "item_ok", "remaining"],
        )

    reader = spark.readStream.schema(ITEM_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(items_dir)
    return stream.groupBy("product_id").applyInPandasWithState(
        ledger,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
