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
    the M3 contract that streaming is a thin shell over M2."""
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
    _, res = P.run_checkout_batch(spark, raw, mode="replay_global")

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
