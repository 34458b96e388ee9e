"""Streaming shell tests: incremental settlement over a file stream,
idempotent replays, quarantine, and batch/stream equivalence."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from event_stream_checkout_spark import pipeline as P
from event_stream_checkout_spark.streaming.pipeline import (
    CheckoutStream,
    streaming_tumbling_counts,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def iso(seconds: int) -> str:
    return (T0 + dt.timedelta(seconds=seconds)).strftime("%Y-%m-%dT%H:%M:%S.%f")


def order(cust, items, seconds):
    return json.dumps(
        {
            "customer_id": cust,
            "items": [{"product_id": p, "quantity": q} for p, q in items],
            "timestamp": iso(seconds),
        }
    )


FILE1 = [
    order("cust-1", [("prod-101", 1)], 0),                 # happy path
    order("cust-2", [("prod-105", 4)], 1),                 # takes 4 of 5
    json.dumps({"customer_id": "cust-3", "items": [], "timestamp": iso(2)}),  # invalid
    'this is {not valid json',                              # malformed
]
FILE2 = [
    order("cust-1", [("prod-101", 1)], 60),                # duplicate payload → same id
    order("cust-4", [("prod-105", 3)], 61),                # only 1 left → FAILED
    order("cust-5", [("prod-102", 2)], 62),                # new order
]


@pytest.fixture()
def stream_env(spark, tmp_path):
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    state_dir = tmp_path / "state"
    return spark, str(input_dir), str(state_dir)


def write_file(input_dir: str, name: str, lines) -> None:
    with open(os.path.join(input_dir, name), "w") as f:
        f.write("\n".join(lines) + "\n")


def test_incremental_stream_settlement(stream_env):
    spark, input_dir, state_dir = stream_env
    write_file(input_dir, "batch1.json", FILE1)
    stream = CheckoutStream(spark, state_dir)
    stream.run_available(input_dir)

    orders1 = {r["customer_id"]: r["status"] for r in stream.orders_table().collect()}
    assert orders1 == {"cust-1": "PROCESSED", "cust-2": "PROCESSED"}
    inv1 = {
        r["product_id"]: r["quantity_available"]
        for r in stream.current_inventory().collect()
    }
    assert inv1["prod-101"] == 49 and inv1["prod-105"] == 1

    quarantine = spark.read.parquet(stream.quarantine_dir)
    reasons = sorted(r["reason"] for r in quarantine.collect())
    assert reasons == ["MALFORMED_JSON", "VALIDATION"]

    # Second tranche arrives: duplicate no-ops, contention FAILs,
    # inventory carries over.
    write_file(input_dir, "batch2.json", FILE2)
    stream.run_available(input_dir)
    orders2 = {r["customer_id"]: r["status"] for r in stream.orders_table().collect()}
    assert orders2 == {
        "cust-1": "PROCESSED",
        "cust-2": "PROCESSED",
        "cust-4": "FAILED",
        "cust-5": "PROCESSED",
    }
    inv2 = {
        r["product_id"]: r["quantity_available"]
        for r in stream.current_inventory().collect()
    }
    assert inv2["prod-101"] == 49  # duplicate did not decrement twice
    assert inv2["prod-105"] == 1   # FAILED order took nothing
    assert inv2["prod-102"] == 18

    # Notifications: only PROCESSED orders, projected fields.
    notes = spark.read.parquet(stream.notify_dir)
    assert notes.columns == ["order_id", "customer_id", "status"]
    assert {r["customer_id"] for r in notes.collect()} == {
        "cust-1", "cust-2", "cust-5"
    }

    # Replay with no new input: checkpoint makes it a no-op.
    stream.run_available(input_dir)
    assert stream.orders_table().count() == 4


def test_batch_stream_equivalence(stream_env):
    """The same events through the streaming shell (two micro-batches)
    and through one batch call yield identical orders + inventory —
    the M3 contract that streaming is a thin shell over M2.  Both sides
    run the default ``optimistic`` mode (the parallel 100 TB path)."""
    spark, input_dir, state_dir = stream_env
    write_file(input_dir, "a.json", FILE1)
    write_file(input_dir, "b.json", FILE2)
    stream = CheckoutStream(spark, state_dir)
    stream.run_available(input_dir)

    raw = spark.createDataFrame(
        [
            (
                json.loads(line)["customer_id"],
                [
                    (i["product_id"], i["quantity"])
                    for i in json.loads(line)["items"]
                ],
                dt.datetime.strptime(
                    json.loads(line)["timestamp"], "%Y-%m-%dT%H:%M:%S.%f"
                ),
            )
            for line in FILE1 + FILE2
            if line.startswith("{") and '"items": [{' in line
        ],
        "customer_id string, items array<struct<product_id:string,"
        "quantity:long>>, timestamp timestamp_ntz",
    )
    _, res = P.run_checkout_batch(spark, raw, mode="optimistic")

    stream_orders = {
        (r["order_id"], r["status"]) for r in stream.orders_table().collect()
    }
    batch_orders = {(r["order_id"], r["status"]) for r in res.orders.collect()}
    assert stream_orders == batch_orders
    stream_inv = {
        r["product_id"]: r["quantity_available"]
        for r in stream.current_inventory().collect()
    }
    batch_inv = {
        r["product_id"]: r["quantity_available"] for r in res.inventory.collect()
    }
    assert stream_inv == batch_inv


def parsed_batch(spark, lines):
    """Build the foreachBatch input frame (WIRE_SCHEMA shape) directly,
    for tests that drive process_batch without the file source."""
    import json as _json

    rows = []
    for line in lines:
        try:
            d = _json.loads(line)
            rows.append((d.get("customer_id"),
                         [(i["product_id"], i["quantity"]) for i in d.get("items", [])],
                         d.get("timestamp"), None))
        except ValueError:
            rows.append((None, None, None, line))
    return spark.createDataFrame(
        rows,
        "customer_id string, items array<struct<product_id:string,"
        "quantity:long>>, timestamp string, _corrupt_record string",
    )


def test_retry_then_dlq(stream_env):
    """T4: a transiently failing record is retried with an attempt
    counter and succeeds on its 3rd receive; a poison record is
    retried twice then diverted to the DLQ on its 3rd receive —
    the reference's maxReceiveCount=3 redrive policy (iac/main.tf:21-24,
    src/order_processor/app.py:45-48)."""
    spark, input_dir, state_dir = stream_env
    from pyspark.sql import functions as SF

    stream = CheckoutStream(
        spark,
        state_dir,
        process_fail=lambda df: (
            ((df.customer_id == "cust-t") & (df.attempts <= 2))
            | (df.customer_id == "cust-p")
        ),
    )
    # Three files → three micro-batches; retries drain on later batches.
    write_file(input_dir, "f1.json", [
        order("cust-t", [("prod-101", 1)], 0),   # fails receives 1-2
        order("cust-p", [("prod-102", 1)], 1),   # always fails
        order("cust-ok", [("prod-103", 1)], 2),
    ])
    write_file(input_dir, "f2.json", [order("cust-f2", [("prod-103", 1)], 60)])
    write_file(input_dir, "f3.json", [order("cust-f3", [("prod-103", 1)], 120)])
    stream.run_available(input_dir)

    orders = {r["customer_id"]: r["status"] for r in stream.orders_table().collect()}
    # cust-t succeeded on its 3rd receive; cust-p never settled.
    assert orders["cust-t"] == "PROCESSED"
    assert "cust-p" not in orders
    assert orders["cust-ok"] == "PROCESSED"

    dlq = (
        spark.read.parquet(stream.quarantine_dir)
        .filter(SF.col("reason") == "PROCESSING_FAILURE")
        .collect()
    )
    assert len(dlq) == 1
    assert dlq[0]["attempts"] == 3
    assert "cust-p" in dlq[0]["payload"]
    # Retry state fully drained.
    assert stream.pending_retries().count() == 0
    # cust-p's item was never decremented; cust-t's was (exactly once).
    inv = {
        r["product_id"]: r["quantity_available"]
        for r in stream.current_inventory().collect()
    }
    assert inv["prod-101"] == 49 and inv["prod-102"] == 20


def test_nondeterministic_fail_predicate_coherent(stream_env):
    """Gate/write coherence (r4/r5 verdict #3): even a NONDETERMINISTIC
    process_fail predicate — modeled as a nondeterministic UDF that
    coin-flips per evaluation, the worst case of a rand()-based fault
    injector — routes every record into exactly one of {settled order,
    pending retry}.  The predicate is evaluated once and pinned
    (localCheckpoint) before it fans out to the retry, DLQ, and
    settlement legs; without the pin each leg would re-flip the coin
    and records would duplicate into two legs or vanish from all."""
    import random

    spark, input_dir, state_dir = stream_env
    from pyspark.sql import functions as SF
    from pyspark.sql import types as ST

    coin = SF.udf(
        lambda: random.random() < 0.5, ST.BooleanType()
    ).asNondeterministic()
    stream = CheckoutStream(
        spark, state_dir, process_fail=lambda df: coin()
    )
    n = 40
    write_file(
        input_dir,
        "f1.json",
        [order(f"cust-{i}", [("prod-101", 1)], i) for i in range(n)],
    )
    stream.run_available(input_dir)

    settled = {r["customer_id"] for r in stream.orders_table().collect()}
    pending = {
        r["customer_id"] for r in stream.pending_retries().collect()
    }
    # Exactly-one routing: no record in both legs, none lost.
    assert settled.isdisjoint(pending)
    assert len(settled) + len(pending) == n
    # Inventory only moved for the settled ones (coherence of the
    # settlement leg with the same single evaluation).
    inv = {
        r["product_id"]: r["quantity_available"]
        for r in stream.current_inventory().collect()
    }
    assert inv["prod-101"] == 50 - len(settled)


def test_ingest_response_channel(stream_env):
    """S1 fidelity: per-record API responses — 400 for validation and
    malformed JSON, 500 for a failed queue publish (record never enters
    processing), 202 + content-addressed order_id on success
    (src/ingest_order/app.py:48-62)."""
    spark, input_dir, state_dir = stream_env
    stream = CheckoutStream(
        spark, state_dir, publish_fail=lambda df: df.customer_id == "cust-5xx"
    )
    write_file(input_dir, "f1.json", [
        order("cust-5xx", [("prod-101", 1)], 0),
        order("cust-1", [("prod-101", 1)], 1),
        json.dumps({"customer_id": "cust-3", "items": [], "timestamp": iso(2)}),
        'this is {not valid json',
    ])
    stream.run_available(input_dir)

    resp = spark.read.parquet(stream.responses_dir).collect()
    by_code = {}
    for r in resp:
        by_code.setdefault(r["status_code"], []).append(r)
    assert sorted(r["reason"] for r in by_code[400]) == [
        "MALFORMED_JSON", "VALIDATION"
    ]
    assert len(by_code[500]) == 1
    assert by_code[500][0]["reason"] == "PUBLISH_FAILURE"
    assert by_code[500][0]["order_id"] is None
    assert len(by_code[202]) == 1 and by_code[202][0]["order_id"] is not None

    # The 500 record never reached the queue: not settled, no decrement.
    orders = {r["customer_id"] for r in stream.orders_table().collect()}
    assert orders == {"cust-1"}
    inv = {
        r["product_id"]: r["quantity_available"]
        for r in stream.current_inventory().collect()
    }
    assert inv["prod-101"] == 49


@pytest.mark.parametrize("crash_point", ["state", "orders"])
def test_replay_converges_after_crash(stream_env, crash_point):
    """The idempotency contract: crash after ANY write step, then
    replay the same batch_id — the final state equals an uninterrupted
    run (no lost inventory decrement, no duplicated orders)."""
    spark, _input_dir, state_dir = stream_env
    batch0 = parsed_batch(spark, FILE1)
    batch1 = parsed_batch(spark, FILE2)

    crashed = CheckoutStream(spark, state_dir + "/crashed")
    crashed.process_batch(batch0, 0)
    crashed._crash_after = crash_point
    with pytest.raises(RuntimeError, match="injected crash"):
        crashed.process_batch(batch1, 1)
    crashed._crash_after = None
    crashed.process_batch(batch1, 1)  # the driver replays the batch

    clean = CheckoutStream(spark, state_dir + "/clean")
    clean.process_batch(batch0, 0)
    clean.process_batch(batch1, 1)

    def snapshot(s):
        orders = sorted(
            (r["order_id"], r["status"], r["batch_id"])
            for r in s.orders_table().collect()
        )
        inv = sorted(
            (r["product_id"], r["quantity_available"])
            for r in s.current_inventory().collect()
        )
        events = sorted(
            (r["order_id"], r["status"])
            for r in spark.read.parquet(s.events_dir).collect()
        )
        return orders, inv, events

    assert snapshot(crashed) == snapshot(clean)
    # Replaying a fully committed batch is also a no-op.
    crashed.process_batch(batch1, 1)
    assert snapshot(crashed) == snapshot(clean)


def test_streaming_windowed_counts_match_batch(spark, tmp_path):
    """True readStream windowed agg == the batch tumbling analogue."""
    from event_stream_checkout_spark.tables import load_table
    from tests.conftest import SF_DIR

    events_dir = str(tmp_path / "events")
    events = load_table(spark, SF_DIR, "events")
    events.write.parquet(events_dir)

    out = (
        streaming_tumbling_counts(spark, events_dir)
        .writeStream.format("memory")
        .queryName("tumbling_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination()
    got = {
        (r["wstart"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM tumbling_counts").collect()
    }
    want = {
        (r["wstart"], r["event_type"]): r["n"]
        for r in (
            events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("wstart"), "event_type", "n")
        ).collect()
    }
    assert got == want


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream join == the equivalent batch join."""
    from event_stream_checkout_spark.streaming.pipeline import (
        streaming_purchase_enrichment,
    )
    from event_stream_checkout_spark.tables import load_table
    from tests.conftest import SF_DIR

    events_dir = str(tmp_path / "events")
    events = load_table(spark, SF_DIR, "events")
    events.write.parquet(events_dir)

    q = (
        streaming_purchase_enrichment(spark, events_dir)
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["purchase_id"], r["signup_id"])
        for r in spark.sql("SELECT * FROM enriched").collect()
    }

    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    s = events.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user_id"),
        F.col("ts").alias("signup_ts"),
    )
    want = {
        (r["purchase_id"], r["signup_id"])
        for r in p.join(
            s,
            (F.col("user_id") == F.col("s_user_id"))
            & (F.col("signup_ts") <= F.col("purchase_ts"))
            & (
                F.col("signup_ts")
                >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")
            ),
        ).collect()
    }
    assert got == want and len(got) > 0


def test_dropduplicates_within_watermark_drops_in_stream_dupes(spark, tmp_path):
    """Duplicate keys arriving within the watermark delay are dropped;
    the first arrival survives."""
    from event_stream_checkout_spark.streaming.pipeline import (
        streaming_dedup_within_watermark,
    )

    events_dir = tmp_path / "events"
    events_dir.mkdir()
    rows = [
        (1, "2024-01-01 10:00:00", 7, "click"),
        (2, "2024-01-01 10:05:00", 7, "click"),   # dup key within delay
        (3, "2024-01-01 10:10:00", 7, "view"),
        (4, "2024-01-01 10:20:00", 8, "click"),
    ]
    df = spark.createDataFrame(
        [(i, dt.datetime.strptime(t, "%Y-%m-%d %H:%M:%S"), u, e, 1.0, "{}")
         for i, t, u, e in rows],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.parquet(str(events_dir / "p"))

    q = (
        streaming_dedup_within_watermark(spark, str(events_dir / "p"))
        .writeStream.format("memory")
        .queryName("deduped")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r["event_id"] for r in spark.sql("SELECT * FROM deduped").collect())
    # Exactly one of the duplicate pair {1, 2} survives (which one is
    # arbitrary within a micro-batch — partitions race); 3 and 4 are
    # distinct keys and must both survive.
    assert len(got) == 3
    assert sum(1 for e in got if e in (1, 2)) == 1
    assert {3, 4} <= set(got)


def test_streaming_late_data_dropped_past_watermark(spark, tmp_path):
    """The watermark guarantee (T7), as Spark actually defines it: a
    window is finalized and emitted exactly once when the watermark
    passes its end, and a late row arriving AFTER finalization can
    neither re-emit nor change it. (Rows later than the watermark but
    arriving before finalization MAY still be aggregated — Spark
    documents dropping as best-effort until state eviction, and 4.1
    behaves that way; verified empirically.)"""
    from event_stream_checkout_spark.streaming.pipeline import (
        streaming_tumbling_counts,
    )

    events_dir = tmp_path / "ev"
    events_dir.mkdir()
    schema = (
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string"
    )

    def write_batch(name, rows):
        spark.createDataFrame(
            [
                (i, dt.datetime.strptime(t, "%Y-%m-%d %H:%M:%S"), 1, "click",
                 1.0, "{}")
                for i, t in rows
            ],
            schema,
        ).coalesce(1).write.parquet(str(events_dir / name))

    import time

    # Batch 1 advances the watermark to 13:00 - 1h = 12:00.
    write_batch("b1", [(1, "2024-01-01 10:30:00"), (2, "2024-01-01 13:00:00")])
    time.sleep(1.1)  # file-source orders batches by modification time
    # Batch 2: watermark 12:00 now active → hour-10 window (end 11:00)
    # finalizes and emits with n=1.
    write_batch("b2", [(3, "2024-01-01 13:30:00")])
    time.sleep(1.1)
    # Batch 3: a very late row for the already-finalized hour-10.
    write_batch("b3", [(4, "2024-01-01 10:45:00"), (5, "2024-01-01 13:45:00")])
    q = (
        streaming_tumbling_counts(
            spark, str(events_dir / "*"), watermark="1 hour",
            max_files_per_trigger=1,
        )
        .writeStream.format("memory")
        .queryName("late_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = [
        (str(r["wstart"]), r["n"])
        for r in spark.sql("SELECT * FROM late_counts").collect()
    ]
    # Exactly one emission of hour 10, with the pre-finalization count;
    # the late event #4 neither re-emitted nor changed it.
    assert got.count(("2024-01-01 10:00:00", 1)) == 1
    assert all(w != "2024-01-01 10:00:00" or n == 1 for w, n in got)


def test_rate_source_wire_schema_and_settlement(spark, tmp_path):
    """The synthetic rate source emits the exact WIRE_SCHEMA contract,
    and its records flow through the settlement body unchanged — the
    source-pluggability guarantee (S1/S2: file, rate, and kafka edges
    all feed the same process_batch)."""
    from event_stream_checkout_spark.streaming.pipeline import (
        WIRE_SCHEMA,
        CheckoutStream,
    )
    from event_stream_checkout_spark.streaming.sources import (
        order_stream_source,
    )

    src = order_stream_source(spark, "rate", rows_per_second=50)
    # Same columns and types as the wire contract (nullability of
    # synthetic literals may be tighter — that is fine for a source).
    assert [(f.name, f.dataType) for f in src.schema] == [
        (f.name, f.dataType) for f in WIRE_SCHEMA
    ]
    assert src.isStreaming

    # The settlement leg runs the BOUNDED rate variant (rate-micro-batch,
    # exactly 40 rows) under Trigger.AvailableNow: the query drains its
    # one deterministic batch and terminates on its own, so a contended
    # 32-core host can make this slow but never flaky — no wall-clock
    # polling, no deadline.
    bounded = order_stream_source(spark, "rate", rows_per_batch=40)
    assert [(f.name, f.dataType) for f in bounded.schema] == [
        (f.name, f.dataType) for f in WIRE_SCHEMA
    ]
    stream = CheckoutStream(spark, str(tmp_path / "state"))
    q = (
        bounded.writeStream.foreachBatch(stream.process_batch)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    orders = stream.orders_table()
    assert orders.count() > 0
    # Synthetic traffic is well-formed: everything settles.
    assert {r["status"] for r in orders.collect()} <= {"PROCESSED", "FAILED"}


def test_kafka_source_raises_without_connector(spark):
    """The kafka edge is config-complete but the connector jar is not
    bundled here: the factory must fail with an actionable message,
    not a bare ClassNotFound."""
    from event_stream_checkout_spark.streaming.sources import (
        order_stream_source,
    )

    with pytest.raises((NotImplementedError, Exception)) as exc:
        df = order_stream_source(
            spark, "kafka", kafka_bootstrap="localhost:9092",
            kafka_topic="orders",
        )
        df.writeStream.format("noop").start()
    assert "kafka" in str(exc.value).lower()


def test_stale_checkpoint_restart_refused(stream_env):
    """If the streaming _checkpoint dir is lost while state_dir
    survives, batch ids restart at 0; the pre-batch readers would then
    hand back older (or seed) state and overwrite committed versions.
    process_batch must refuse rather than regress.  (The equal-id
    case — including single-batch histories — is covered by the input
    fingerprint; see test_stale_checkpoint_single_batch_refused.)"""
    import shutil

    spark, input_dir, state_dir = stream_env
    stream = CheckoutStream(spark, state_dir)
    write_file(input_dir, "b0.json", [order("cust-1", [("prod-101", 1)], 0)])
    stream.run_available(input_dir)
    write_file(input_dir, "b1.json", [order("cust-2", [("prod-101", 1)], 1)])
    stream.run_available(input_dir)
    assert sorted(os.listdir(os.path.join(state_dir, "inventory"))) == ["v0", "v1"]

    shutil.rmtree(os.path.join(state_dir, "_checkpoint"))
    write_file(input_dir, "b2.json", [order("cust-3", [("prod-101", 1)], 2)])
    fresh = CheckoutStream(spark, state_dir)
    with pytest.raises(Exception) as exc:
        fresh.run_available(input_dir)
    assert "older than committed state" in str(exc.value)
    # Committed inventory is untouched by the refused run.
    inv = {
        r["product_id"]: r["quantity_available"]
        for r in fresh.current_inventory().collect()
    }
    assert inv["prod-101"] == 48


def test_stale_checkpoint_single_batch_refused(stream_env):
    """r3 advisor finding: over a SINGLE-committed-batch history, a
    lost checkpoint restarts at the same batch_id 0, so the id-only
    guard cannot fire.  The input fingerprint (row count + order-free
    checksum, committed alongside the inventory version) separates the
    two cases: same input → legitimate idempotent replay, allowed;
    different input → reset checkpoint over committed state, refused."""
    import shutil

    spark, input_dir, state_dir = stream_env
    stream = CheckoutStream(spark, state_dir)
    write_file(input_dir, "b0.json", [order("cust-1", [("prod-101", 1)], 0)])
    stream.run_available(input_dir)
    assert sorted(os.listdir(os.path.join(state_dir, "inventory"))) == ["v0"]

    # Same input, lost checkpoint → replay of batch 0 with identical
    # rows: allowed, converges to the same state.
    shutil.rmtree(os.path.join(state_dir, "_checkpoint"))
    replay = CheckoutStream(spark, state_dir)
    replay.run_available(input_dir)
    inv = {
        r["product_id"]: r["quantity_available"]
        for r in replay.current_inventory().collect()
    }
    assert inv["prod-101"] == 49

    # Input rotated (b0 gone, new b1) + lost checkpoint → batch 0 now
    # carries DIFFERENT rows than the committed v0 → refused, state
    # intact.
    shutil.rmtree(os.path.join(state_dir, "_checkpoint"))
    os.remove(os.path.join(input_dir, "b0.json"))
    write_file(input_dir, "b1.json", [order("cust-2", [("prod-101", 5)], 1)])
    fresh = CheckoutStream(spark, state_dir)
    with pytest.raises(Exception) as exc:
        fresh.run_available(input_dir)
    assert "DIFFERENT input" in str(exc.value)
    inv = {
        r["product_id"]: r["quantity_available"]
        for r in fresh.current_inventory().collect()
    }
    assert inv["prod-101"] == 49


def test_streaming_replay_global_matches_reference_loop(stream_env):
    """ADVICE r2: the streaming shell in ``mode='replay_global'`` must
    reproduce the REFERENCE transactional loop exactly — a FAILED
    order's demand is released (its rollback takes nothing), so a later
    order can still settle.  The default ``optimistic`` prefix-demand
    rule intentionally diverges here (it charges failed orders' demand
    against stock — documented in SURVEY.md §1.4); this test pins the
    fidelity mode so that divergence stays an explicit choice, not a
    silent drift."""
    spark, input_dir, state_dir = stream_env
    # Seed stock: prod-104 = 10, prod-105 = 5.
    # A wants (prod-104 x5, prod-105 x9) → FAILS on prod-105, whole
    # order rolls back.  B wants (prod-104 x8) → reference PROCESSES it
    # (A took nothing); optimistic would charge A's 5 and fail B.
    lines = [
        order("cust-A", [("prod-104", 5), ("prod-105", 9)], 0),
        order("cust-B", [("prod-104", 8)], 1),
    ]
    write_file(input_dir, "b0.json", lines)
    stream = CheckoutStream(spark, state_dir, mode="replay_global")
    stream.run_available(input_dir)

    statuses = {
        r["customer_id"]: r["status"] for r in stream.orders_table().collect()
    }
    assert statuses == {"cust-A": "FAILED", "cust-B": "PROCESSED"}
    inv = {
        r["product_id"]: r["quantity_available"]
        for r in stream.current_inventory().collect()
    }
    assert inv["prod-104"] == 2 and inv["prod-105"] == 5

    # Same events through the batch reference loop → identical result.
    raw = parsed_batch(spark, lines).drop("_corrupt_record").withColumn(
        "timestamp",
        F.to_timestamp_ntz(
            F.col("timestamp"), F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        ),
    )
    _, res = P.run_checkout_batch(spark, raw, mode="replay_global")
    batch_statuses = {
        r["customer_id"]: r["status"] for r in res.orders.collect()
    }
    assert batch_statuses == statuses
    batch_inv = {
        r["product_id"]: r["quantity_available"] for r in res.inventory.collect()
    }
    assert batch_inv["prod-104"] == 2 and batch_inv["prod-105"] == 5


def test_process_batch_job_budget(stream_env):
    """Per-micro-batch driver-job tripwire (r2 verdict ask): the
    conditional-write gates must stay ONE union-of-aggregates job —
    not a count() per sink. The measured budget (~40 jobs) is
    dominated by cheap metadata reads (every versioned-state read
    opens parquet footers) plus the pinned checkpoints and writes; the
    bound has ~25% headroom. If this fails after an edit, look for a
    reintroduced per-sink count() or an extra full-plan action."""
    spark, input_dir, state_dir = stream_env
    stream = CheckoutStream(spark, state_dir)
    # process_batch parses the raw wire frame itself; feed it the raw
    # string timestamp shape it expects.
    raw = parsed_batch(spark, FILE1)
    sc = spark.sparkContext
    sc.setJobGroup("pb-budget", "job budget")
    try:
        stream.process_batch(raw, 0)
        jobs = sc.statusTracker().getJobIdsForGroup("pb-budget")
    finally:
        sc.setJobGroup(None, None)
    assert 0 < len(jobs) <= 50, f"{len(jobs)} driver jobs in one micro-batch"


def test_stream_stream_interval_join_matches_graded_batch(spark, tmp_path):
    """The graded stream_interval_join batch frame is row-identical to
    the REAL two-readStream watermarked interval join (T9): same
    user-key equality, same (0, 30min] range predicate, watermarks on
    both sides so Spark can evict buffered state.  This is the
    contract that makes the batch grading transferable to the
    streaming deployment."""
    from event_stream_checkout_spark.operators.lakehouse import (
        _INTERVAL_MIN,
        q_stream_interval_join,
    )
    from event_stream_checkout_spark.tables import load_table
    from tests.conftest import SF_DIR

    events_dir = str(tmp_path / "events")
    events = load_table(spark, SF_DIR, "events")
    events.write.parquet(events_dir)
    schema = spark.read.parquet(events_dir).schema

    def leg(kind, id_alias, ts_alias, user_alias):
        return (
            spark.readStream.schema(schema)
            .parquet(events_dir)
            .filter(F.col("event_type") == kind)
            .select(
                F.col("user_id").alias(user_alias),
                F.col("event_id").alias(id_alias),
                # Watermarks require TIMESTAMP (not NTZ); the session
                # tz is pinned UTC so the cast is a pure retag.
                F.col("ts").cast("timestamp").alias(ts_alias),
            )
            .withWatermark(ts_alias, "1 hour")
        )

    v = leg("view", "view_id", "view_ts", "user_id")
    p = leg("purchase", "purchase_id", "purchase_ts", "p_user_id")
    joined = v.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {_INTERVAL_MIN} MINUTES")
        ),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ivj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck-ivj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["view_id"], r["purchase_id"])
        for r in spark.sql("SELECT view_id, purchase_id FROM ivj").collect()
    }
    want = {
        (r["view_id"], r["purchase_id"])
        for r in q_stream_interval_join(spark, SF_DIR).collect()
    }
    assert got == want and len(want) > 0


def test_session_paths_batch_matches_session_window_stream(spark, tmp_path):
    """E4's batch gap-sessionizer (lag + boundary prefix-sum) is
    row-identical to its TRUE-streaming twin: a watermarked
    ``session_window`` aggregation over a readStream of the same
    events, drained with availableNow (the T9 two-form pattern, r7
    verdict item 7).  A far-future sentinel event advances the global
    watermark past every real session so append mode flushes them all;
    the sentinel's own session is excluded from the compare.  This is
    the contract that makes the batch grading transferable to a live
    sessionization deployment."""
    from collections import Counter

    from event_stream_checkout_spark.operators.events_analytics import (
        _SESSION_GAP_MIN,
        session_paths,
    )
    from event_stream_checkout_spark.tables import load_table
    from tests.conftest import SF_DIR

    events = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    sentinel = spark.createDataFrame(
        [(-1, -1, "flush", max_ts + dt.timedelta(hours=10))],
        "user_id long, event_id long, event_type string, ts timestamp_ntz",
    )
    events_dir = str(tmp_path / "events")
    events.unionByName(sentinel).write.parquet(events_dir)
    schema = spark.read.parquet(events_dir).schema

    stream = (
        spark.readStream.schema(schema)
        .parquet(events_dir)
        # Watermarks require TIMESTAMP (session tz pinned UTC -> the
        # cast is a pure retag of the NTZ wall time).
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
    )
    agg = stream.groupBy(
        F.session_window("ts", f"{_SESSION_GAP_MIN} minutes"),
        "user_id",
    ).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sesspaths")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck-sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = Counter(
        (r["user_id"], r["path"])
        for r in spark.sql(
            "SELECT user_id, path FROM sesspaths WHERE user_id >= 0"
        ).collect()
    )
    want = Counter(
        (r["user_id"], r["path"]) for r in session_paths(events).collect()
    )
    assert got == want and len(want) > 0


def test_tws_timer_sessionizer_paths(spark, tmp_path):
    """T10's two emission paths on a crafted stream: user 1's first
    session closes IN-BATCH (gap rollover inside handleInputRows) and
    its second closes by TIMER; user 2 has a single session that only
    a timer can close (no later record for that key ever arrives) —
    the case applyInPandasWithState cannot express.  The stale-timer
    guard is exercised by user 1's rollover (the first session's
    timer must not truncate the re-armed second session)."""
    import pandas as pd

    from event_stream_checkout_spark.operators.streaming_analogues import (
        q_stream_session_tws,
    )
    from event_stream_checkout_spark.streaming.stateful import tws_available

    if not tws_available():
        import pytest as _pytest

        _pytest.skip("no protobuf runtime for TWS")

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)

    def m(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        (1, m(0), 1, "view", 1.0, "{}"),
        (2, m(10), 1, "click", 1.0, "{}"),   # same session
        (3, m(50), 1, "view", 1.0, "{}"),    # 40-min gap -> new session
        (4, m(60), 1, "click", 1.0, "{}"),
        (5, m(5), 2, "view", 1.0, "{}"),     # single-event session
    ]
    pdf = pd.DataFrame(
        [(eid, ts, uid, et, v, "{}") for eid, ts, uid, et, v, _ in rows],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    sf_dir = str(tmp_path / "sfx")
    import os

    os.makedirs(sf_dir, exist_ok=True)
    pdf.to_parquet(os.path.join(sf_dir, "events.parquet"))

    def us(minutes):
        return int((m(minutes) - dt.datetime(1970, 1, 1)).total_seconds() * 1e6)

    got = {
        (r["user_id"], r["sess_start_us"], r["sess_end_us"], r["n_events"])
        for r in q_stream_session_tws(spark, sf_dir).collect()
    }
    assert got == {
        (1, us(0), us(10), 2),    # closed in-batch by the rollover
        (1, us(50), us(60), 2),   # closed by the timer
        (2, us(5), us(5), 1),     # timer-only close (silent key)
    }


def test_tws_mapstate_counters_accumulate_across_batches(spark, tmp_path):
    """T11's MapState must ACCUMULATE across micro-batches (point
    read-modify-write per subkey), not reset: two files drained with
    maxFilesPerTrigger=1 put the same user in two batches; the final
    emission must carry batch-1 counts + batch-2 increments."""
    import os

    import pandas as pd

    from event_stream_checkout_spark.streaming.stateful import (
        TYPE_COUNT_STREAM_SCHEMA,
        TypeCounter,
        ensure_protobuf,
        tws_available,
    )

    if not tws_available():
        pytest.skip("no protobuf runtime for TWS")
    ensure_protobuf(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    events_dir = str(tmp_path / "ev")
    os.makedirs(events_dir)
    pd.DataFrame(
        {"user_id": [1, 1, 1], "event_type": ["view", "view", "click"]}
    ).to_parquet(os.path.join(events_dir, "a.parquet"))
    pd.DataFrame(
        {"user_id": [1, 2], "event_type": ["view", "buy"]}
    ).to_parquet(os.path.join(events_dir, "b.parquet"))

    stream = (
        spark.readStream.schema(TYPE_COUNT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    from event_stream_checkout_spark.streaming.stateful import (
        TYPE_COUNT_OUTPUT_SCHEMA,
    )

    out = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=TypeCounter(),
        outputStructType=TYPE_COUNT_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("typecnt")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM typecnt").collect()
    # LAST emission per (user, type) = the accumulated count.  File
    # order within availableNow is deterministic (listing order), but
    # to stay order-proof take the MAX per key — counts only grow.
    final = {}
    for r in rows:
        k = (r["user_id"], r["event_type"])
        final[k] = max(final.get(k, 0), r["n"])
    assert final == {
        (1, "view"): 3,   # 2 in one batch + 1 in the other
        (1, "click"): 1,
        (2, "buy"): 1,
    }


def test_tws_sessionizer_live_watermark_no_sentinel(spark, tmp_path):
    """T10's deployment mode (r9-queue soak, closed early): NO
    sentinel — drained file-by-file (maxFilesPerTrigger=1), the
    ever-advancing watermark itself closes sessions whose expiry it
    passes, and the stream's final open session correctly stays
    UNEMITTED (a live pipeline would emit it when later data advances
    the watermark — exactly the semantics a sentinel fakes for the
    graded availableNow drain)."""
    import os
    import time

    import pandas as pd

    from event_stream_checkout_spark.streaming.stateful import (
        SESSION_STREAM_SCHEMA,
        session_stream_tws,
        tws_available,
    )

    if not tws_available():
        pytest.skip("no protobuf runtime for TWS")

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)

    def us(minutes):
        return int(
            (t0 + dt.timedelta(minutes=minutes) - dt.datetime(1970, 1, 1))
            .total_seconds() * 1e6
        )

    def write_file(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["user_id", "event_id", "ts_us", "ts"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts_us"], unit="us").astype(
            "datetime64[us]"
        )
        pdf.to_parquet(os.path.join(events_dir, name))
        time.sleep(0.05)  # distinct mtimes -> deterministic file order

    events_dir = str(tmp_path / "ev")
    os.makedirs(events_dir)
    # file 1: user 1, two events 10 min apart (one session).
    write_file("a.parquet", [(1, 1, us(0), us(0)), (1, 2, us(10), us(10))])
    # file 2: user 2 at +2h — its watermark passes user 1's expiry.
    write_file("b.parquet", [(2, 3, us(120), us(120))])
    # file 3: user 2 again at +4h — closes user 2's first session;
    # this last session itself stays open.
    write_file("c.parquet", [(2, 4, us(240), us(240))])

    out = session_stream_tws(spark, events_dir, 30 * 60)
    q = (
        out.writeStream.format("memory")
        .queryName("livesess")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .option("maxFilesPerTrigger", 1)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["sess_start_us"], r["sess_end_us"], r["n_events"])
        for r in spark.sql("SELECT * FROM livesess").collect()
    }
    assert (1, us(0), us(10), 2) in got, got
    assert (2, us(120), us(120), 1) in got, got
    # user 2's +4h session is still open — correctly NOT emitted.
    assert not any(s == us(240) for _, s, _, _ in got), got


def test_tws_sessionizer_state_survives_restart(spark, tmp_path):
    """T10 recovery: an OPEN session must survive a full query
    stop/restart through the RocksDB checkpoint — run 1 drains file 1
    (user 1's session stays open in state), the query is torn down,
    file 2 arrives, and run 2 (same checkpoint) must CONTINUE that
    session: an event 10 minutes after the pre-restart one lands in
    the SAME session, and the sentinel then closes it as one unit.
    This is the crash-replay contract of the sessionizer — losing
    state across restarts would emit two half-sessions."""
    import os
    import time

    import pandas as pd

    from event_stream_checkout_spark.streaming.stateful import (
        session_stream_tws,
        tws_available,
    )

    if not tws_available():
        pytest.skip("no protobuf runtime for TWS")

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)

    def us(minutes):
        return int(
            (t0 + dt.timedelta(minutes=minutes) - dt.datetime(1970, 1, 1))
            .total_seconds() * 1e6
        )

    events_dir = str(tmp_path / "ev")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(events_dir)

    def write_file(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["user_id", "event_id", "ts_us", "ts"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts_us"], unit="us").astype(
            "datetime64[us]"
        )
        pdf.to_parquet(os.path.join(events_dir, name))
        time.sleep(0.05)

    def drain():
        q = (
            session_stream_tws(spark, events_dir, 30 * 60)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: user 1's session opens and stays open (nothing advances
    # the watermark past its expiry).
    write_file("a.parquet", [(1, 1, us(0), us(0))])
    drain()
    # restart: a second event 10 min later (same session) + a
    # far-future sentinel to flush.
    write_file("b.parquet", [(1, 2, us(10), us(10)),
                             (-1, -1, us(600), us(600))])
    drain()
    got = {
        (r["user_id"], r["sess_start_us"], r["sess_end_us"], r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
        if r["user_id"] >= 0
    }
    assert got == {(1, us(0), us(10), 2)}, got


def test_funnel_batch_matches_stateful_stream(spark, tmp_path):
    """E1's batch funnel is row-identical to its TRUE-streaming twin:
    an applyInPandasWithState per-user funnel tracker over a readStream
    of the same events, drained with availableNow (r8 verdict item 6 —
    the evt_session_paths two-form pattern).  State carries the three
    per-stage candidate timestamp lists, so the tracker re-derives the
    progressive-min funnel after EVERY batch — arrival order across
    batches cannot change the final answer, which is what makes the
    batch grading transferable to a live funnel deployment."""
    import pandas as pd
    from pyspark.sql import types as T

    from event_stream_checkout_spark.operators.events_analytics import (
        _FUNNEL_STAGES,
        _FUNNEL_WINDOW_DAYS,
        q_evt_funnel,
    )
    from event_stream_checkout_spark.tables import load_table
    from tests.conftest import SF_DIR

    events = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type").isin(list(_FUNNEL_STAGES)))
        .select("user_id", "event_type", "ts")
    )
    events_dir = str(tmp_path / "funnel-events")
    # per-key staging: each user's rows live in one file (ledger pattern)
    events.repartition(F.col("user_id")).write.parquet(events_dir)
    schema = spark.read.parquet(events_dir).schema

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("reached", T.IntegerType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("s1", T.ArrayType(T.LongType())),
            T.StructField("s2", T.ArrayType(T.LongType())),
            T.StructField("s3", T.ArrayType(T.LongType())),
        ]
    )
    window_ns = _FUNNEL_WINDOW_DAYS * 86_400_000_000_000
    stages = _FUNNEL_STAGES

    def tracker(key, pdfs, state):
        (user_id,) = key
        lists = (
            [list(x) for x in state.get] if state.exists else [[], [], []]
        )
        for pdf in pdfs:
            ns = pdf["ts"].astype("int64")  # epoch nanos (pandas native)
            for et, t in zip(pdf["event_type"], ns):
                lists[stages.index(et)].append(int(t))
        state.update(tuple(lists))
        s1, s2, s3 = (sorted(l) for l in lists)
        reached = 0
        ts1 = ts2 = None
        if s1:
            reached, ts1 = 1, s1[0]
            c2 = [t for t in s2 if ts1 < t <= ts1 + window_ns]
            if c2:
                reached, ts2 = 2, c2[0]
                c3 = [t for t in s3 if ts2 < t <= ts1 + window_ns]
                if c3:
                    reached = 3
        yield pd.DataFrame({"user_id": [user_id], "reached": [reached]})

    stream = spark.readStream.schema(schema).parquet(events_dir)
    tracked = stream.groupBy("user_id").applyInPandasWithState(
        tracker,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
    q = (
        tracked.writeStream.format("memory")
        .queryName("funneltwin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck-funnel"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        "SELECT reached, count(*) AS n FROM funneltwin GROUP BY reached"
    ).collect()
    by_reached = {r["reached"]: r["n"] for r in rows}
    got = {
        f"{i}_{stages[i - 1]}": sum(
            n for rch, n in by_reached.items() if rch >= i
        )
        for i in (1, 2, 3)
    }
    want = {
        r["stage"]: r["n_users"] for r in q_evt_funnel(spark, SF_DIR).collect()
    }
    assert got == want and want[f"1_{stages[0]}"] > 0


def test_attribution_batch_matches_stateful_stream(spark, tmp_path):
    """E3's batch last-touch attribution is row-identical to its
    TRUE-streaming twin: a per-user applyInPandasWithState last-touch
    tracker (ValueState = last non-purchase type before the stream
    head) over the same events, availableNow-drained; the channel
    aggregation runs over the sink with the SAME fixed-point dsum the
    batch query uses, so totals are engine-exact, not approximate."""
    import pandas as pd
    from pyspark.sql import types as T

    from event_stream_checkout_spark.functions.numeric import dsum
    from event_stream_checkout_spark.operators.events_analytics import (
        q_evt_attribution,
    )
    from event_stream_checkout_spark.tables import load_table
    from tests.conftest import SF_DIR

    events = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "event_type", "ts", "value"
    )
    events_dir = str(tmp_path / "attrib-events")
    events.repartition(F.col("user_id")).write.parquet(events_dir)
    schema = spark.read.parquet(events_dir).schema

    out_schema = T.StructType(
        [
            T.StructField("channel", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("last", T.StringType())])

    def tracker(key, pdfs, state):
        last = state.get[0] if state.exists else None
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "event_id"], kind="stable"
        )
        out = []
        for et, v in zip(pdf["event_type"], pdf["value"]):
            if et == "purchase":
                out.append((last or "none", None if pd.isna(v) else float(v)))
            else:
                last = et
        state.update((last,))
        yield pd.DataFrame(out, columns=["channel", "value"])

    stream = spark.readStream.schema(schema).parquet(events_dir)
    tracked = stream.groupBy("user_id").applyInPandasWithState(
        tracker,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
    q = (
        tracked.writeStream.format("memory")
        .queryName("attribtwin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck-attrib"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["channel"]: (r["n_purchases"], r["total_value"])
        for r in spark.table("attribtwin")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            dsum("value").alias("total_value"),
        )
        .collect()
    }
    want = {
        r["channel"]: (r["n_purchases"], r["total_value"])
        for r in q_evt_attribution(spark, SF_DIR).collect()
    }
    assert got == want and len(want) > 1


def test_bounce_rate_batch_matches_tws_sessionizer(spark):
    """E11's batch bounce rate is row-identical to the rollup of the
    TRUE-streaming session frame: T10's timer-closed TWS gap
    sessionizer (same 30-minute gap, same strict-> boundary) emits
    (user, session_start, n_events); bouncing is n_events == 1 and the
    day is the session's START day — so the batch grading transfers to
    a live sessionization deployment with no recomputation."""
    from event_stream_checkout_spark.operators.events_analytics import (
        q_evt_bounce_rate,
    )
    from event_stream_checkout_spark.operators.streaming_analogues import (
        q_stream_session_tws,
    )
    from tests.conftest import SF_DIR

    sessions = q_stream_session_tws(spark, SF_DIR)
    roll = (
        sessions.groupBy(
            F.to_date(F.timestamp_micros(F.col("sess_start_us"))).alias(
                "day"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_bounced"),
        )
        .select(
            "day",
            "n_sessions",
            "n_bounced",
            F.round(
                F.col("n_bounced").cast("double") / F.col("n_sessions"), 6
            ).alias("bounce_rate"),
        )
    )
    got = {tuple(r) for r in roll.collect()}
    want = {tuple(r) for r in q_evt_bounce_rate(spark, SF_DIR).collect()}
    assert got == want and len(want) > 0


def test_conversion_lag_batch_matches_stateful_stream(spark, tmp_path):
    """E12's batch conversion lag is row-identical to its
    TRUE-streaming twin: an applyInPandasWithState per-user tracker
    (state = first-view timestamp + every purchase timestamp, so the
    strictly-after-first-view minimum re-derives after ANY arrival
    order) over a readStream of the same events, drained with
    availableNow — the E1/E3 two-form pattern extended to E12."""
    import pandas as pd
    from pyspark.sql import types as T

    from event_stream_checkout_spark.operators.events_analytics import (
        q_evt_conversion_lag,
    )
    from event_stream_checkout_spark.tables import load_table
    from tests.conftest import SF_DIR

    events = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type").isin(["view", "purchase"]))
        .select("user_id", "event_type", "ts")
    )
    events_dir = str(tmp_path / "conv-events")
    events.repartition(F.col("user_id")).write.parquet(events_dir)
    schema = spark.read.parquet(events_dir).schema

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("fv_us", T.LongType()),
            T.StructField("fp_us", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("fv", T.LongType()),
            T.StructField("purchases", T.ArrayType(T.LongType())),
        ]
    )

    def tracker(key, pdfs, state):
        (user_id,) = key
        fv, purchases = (
            state.get if state.exists else (None, [])
        )
        purchases = list(purchases)
        for pdf in pdfs:
            us = pdf["ts"].astype("int64") // 1000  # ns -> us
            for et, t in zip(pdf["event_type"], us):
                if et == "view":
                    fv = int(t) if fv is None else min(fv, int(t))
                else:
                    purchases.append(int(t))
        state.update((fv, purchases))
        if fv is not None:
            after = [p for p in purchases if p > fv]
            if after:
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "fv_us": [fv],
                        "fp_us": [min(after)],
                    }
                )

    stream = spark.readStream.schema(schema).parquet(events_dir)
    tracked = stream.groupBy("user_id").applyInPandasWithState(
        tracker,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
    q = (
        tracked.writeStream.format("memory")
        .queryName("convtwin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck-conv"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    twin = spark.sql("SELECT * FROM convtwin")
    roll = (
        twin.select(
            F.to_date(F.timestamp_micros(F.col("fv_us"))).alias(
                "cohort_day"
            ),
            ((F.col("fp_us") - F.col("fv_us")) / F.lit(1_000_000))
            .cast("long")
            .alias("lag_s"),
        )
        .groupBy("cohort_day")
        .agg(
            F.count(F.lit(1)).alias("n_converted"),
            F.round(
                F.sum("lag_s").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_lag_s"),
            F.min("lag_s").alias("min_lag_s"),
            F.max("lag_s").alias("max_lag_s"),
        )
    )
    got = {tuple(r) for r in roll.collect()}
    want = {
        tuple(r) for r in q_evt_conversion_lag(spark, SF_DIR).collect()
    }
    assert got == want and len(want) > 0


def test_stream_stream_outer_interval_join_matches_graded_batch(
    spark, tmp_path
):
    """T12: the graded LEFT OUTER interval-join batch frame is
    row-identical to the real two-readStream watermarked leftOuter
    join — including the NULL rows for views that never converted,
    which Structured Streaming may only emit once BOTH watermarks
    pass view_ts + range bound.  Far-future sentinel events (one per
    leg, negative user ids) push the final watermark past every real
    view so availableNow drains all outer rows; sentinels are
    excluded from the compare."""
    import datetime as _dt

    from event_stream_checkout_spark.operators.lakehouse import (
        _INTERVAL_MIN,
        q_stream_interval_join_outer,
    )
    from event_stream_checkout_spark.tables import load_table
    from tests.conftest import SF_DIR

    events_dir = str(tmp_path / "events-outer")
    events = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    far = max_ts + _dt.timedelta(days=2)
    sentinels = spark.createDataFrame(
        [(-1, -1, "view", far), (-2, -2, "purchase", far)],
        "user_id long, event_id long, event_type string, ts timestamp_ntz",
    )
    events.unionByName(sentinels).write.parquet(events_dir)
    schema = spark.read.parquet(events_dir).schema

    def leg(kind, id_alias, ts_alias, user_alias):
        return (
            spark.readStream.schema(schema)
            .parquet(events_dir)
            .filter(F.col("event_type") == kind)
            .select(
                F.col("user_id").alias(user_alias),
                F.col("event_id").alias(id_alias),
                F.col("ts").cast("timestamp").alias(ts_alias),
            )
            .withWatermark(ts_alias, "1 hour")
        )

    v = leg("view", "view_id", "view_ts", "user_id")
    p = leg("purchase", "purchase_id", "purchase_ts", "p_user_id")
    joined = v.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {_INTERVAL_MIN} MINUTES")
        ),
        "leftOuter",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ivjo")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck-ivjo"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["view_id"], r["purchase_id"])
        for r in spark.sql(
            "SELECT view_id, purchase_id FROM ivjo WHERE user_id >= 0"
        ).collect()
    }
    want = {
        (r["view_id"], r["purchase_id"])
        for r in q_stream_interval_join_outer(spark, SF_DIR).collect()
    }
    assert got == want and len(want) > 0
    assert any(pid is None for _, pid in want)  # outer rows present


def test_tws_mapstate_ttl_evicts_idle_entries(spark, tmp_path):
    """TypeCounterTTL (r15, the TWS TTLConfig state bound): an entry
    idle past the TTL evicts, so a later batch for the same user
    restarts its counter instead of accumulating — the bounded-state
    divergence the class docstring declares (contrast
    test_tws_mapstate_counters_accumulate_across_batches, where the
    un-TTL'd counter must accumulate forever).  Two drains on ONE
    checkpoint, separated by > TTL of processing time: drain 1 writes
    user 1's counts; after the sleep, drain 2's emission for user 1
    must carry ONLY the new batch's counts.

    Harness note: TTL needs timeMode="processingTime", and under that
    mode an availableNow query never self-terminates (the engine
    keeps scheduling empty batches to evaluate processing-time
    expiry), so each drain polls the parquet sink for the data
    batch's emission and then stops the query; drain 2's own rows are
    the multiset delta over drain 1's (the sink appends)."""
    import time
    from collections import Counter

    import pandas as pd

    from event_stream_checkout_spark.streaming.stateful import (
        ensure_protobuf,
        type_counts_stream_tws_ttl,
        tws_available,
    )

    if not tws_available():
        pytest.skip("no protobuf runtime for TWS")
    ensure_protobuf(spark)

    events_dir = tmp_path / "ev"
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    events_dir.mkdir()
    ttl_ms = 3_000

    def drain(n_total_expected: int) -> Counter:
        q = (
            type_counts_stream_tws_ttl(spark, str(events_dir), ttl_ms)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            rows: list = []
            for _ in range(240):
                try:
                    rows = spark.read.parquet(out_dir).collect()
                except Exception:  # noqa: BLE001 — sink not committed yet
                    rows = []
                if len(rows) >= n_total_expected:
                    break
                time.sleep(0.5)
        finally:
            q.stop()
            q.awaitTermination()
        assert len(rows) >= n_total_expected, "emission never landed"
        return Counter(
            (r["user_id"], r["event_type"], r["n"]) for r in rows
        )

    pd.DataFrame(
        {"user_id": [1, 1, 1], "event_type": ["view", "view", "click"]}
    ).to_parquet(str(events_dir / "a.parquet"))
    first = drain(2)
    assert first == Counter({(1, "view", 2): 1, (1, "click", 1): 1})

    time.sleep(ttl_ms / 1000 + 2.0)  # idle past the TTL
    pd.DataFrame(
        {"user_id": [1], "event_type": ["view"]}
    ).to_parquet(str(events_dir / "b.parquet"))
    second = drain(3)
    # Drain 2's own emission = the sink delta: view restarted at 1
    # and click's expired entry vanished from the emitted map — both
    # prior counts evicted, not accumulated.
    assert second - first == Counter({(1, "view", 1): 1})
