#!/usr/bin/env python
"""Measure end-to-end settlement throughput of the streaming shell.

Drives the synthetic rate source (well-formed orders at a target
rate) through the FULL micro-batch body — validation, identity,
first-writer-wins dedup, optimistic settlement, idempotent state
writes — and reports settled orders/sec, micro-batch count, and
driver jobs per batch.

Context: the reference processes orders one SQS message at a time
(batch_size=1, iac/main.tf:30-36) through Lambda + MySQL row locks —
an implied ceiling of ~tens of orders/sec per concurrent consumer
(BASELINE.md).  This measures the Spark engine's equivalent number on
local[*]; on a cluster it scales with executors because every stage
is keyed-parallel.

Usage:
  python tools/stream_throughput.py [rows_per_second] [seconds]
  python tools/stream_throughput.py --sweep 5000,10000,20000,40000 [seconds]

The sweep prints one JSON line per rate; the knee is where settled/s
stops tracking the offered rate.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _sentinel_job_ids(spark, tag: str) -> tuple[int, int]:
    """(min, max) job id of a sentinel action in a uniquely named
    group (job groups are thread-local, so the streaming thread's jobs
    can't be grouped directly — but job ids are globally monotonic, so
    before/after sentinels bracket them).  One action can spawn
    several jobs (AQE stages), hence the range."""
    sc = spark.sparkContext
    sc.setJobGroup(tag, "sentinel")
    try:
        spark.range(1).count()
        jids = sc.statusTracker().getJobIdsForGroup(tag)
    finally:
        sc.setJobGroup(None, None)
    return min(jids), max(jids)


def run_once(spark, rate: int, seconds: int) -> dict:
    from event_stream_checkout_spark.streaming.pipeline import CheckoutStream
    from event_stream_checkout_spark.streaming.sources import order_stream_source

    state = tempfile.mkdtemp(prefix="ecs-throughput-")
    stream = CheckoutStream(spark, state)
    src = order_stream_source(spark, "rate", rows_per_second=rate)

    _, j0 = _sentinel_job_ids(spark, f"tp-pre-{rate}")
    t0 = time.time()
    q = (
        src.writeStream.foreachBatch(stream.process_batch)
        .option("checkpointLocation", state + "/_ck")
        .trigger(processingTime="1 second")
        .start()
    )
    time.sleep(seconds)
    q.stop()
    q.awaitTermination()
    elapsed = time.time() - t0
    j1, _ = _sentinel_job_ids(spark, f"tp-post-{rate}")

    settled = stream.orders_table().count()
    batches = len(
        [v for v in os.listdir(stream.inv_root) if v.startswith("v")]
    ) if os.path.isdir(stream.inv_root) else 0
    jobs = j1 - j0 - 1  # ids strictly between the two sentinels
    return {
        "metric": "settled_orders_per_sec",
        "value": round(settled / elapsed, 1),
        "unit": "orders/sec",
        "settled_orders": settled,
        "elapsed_sec": round(elapsed, 1),
        "offered_rate": rate,
        "micro_batches": batches,
        "driver_jobs_per_batch": round(jobs / max(batches, 1), 1),
    }


def run_ledger(spark, sf_dir: str, fmt: str = "parquet") -> dict:
    """Throughput of the per-key stateful ledger over sf_dir's FULL
    item history through the staging path ``fmt`` ("parquet" = the
    graded scale path, "json" = the wire-format default) — the r6→r7
    ask: a >sf0.1 streaming datapoint on the parquet staging path.

    Staging write and streaming fold are timed separately: staging is
    the pay-once spooling a real deployment gets for free from its log
    (Kafka/queue), the fold is the recurring stateful work, so
    ``items_per_sec`` (fold-only) is the comparable number against the
    reference's ~tens-of-orders/sec Lambda+row-lock ceiling."""
    import shutil
    import tempfile as _tf

    from pyspark.sql import functions as F

    from event_stream_checkout_spark.operators.checkout import (
        inventory,
        order_items,
    )
    from event_stream_checkout_spark.streaming.stateful import (
        inventory_ledger_stream,
    )

    root = _tf.mkdtemp(prefix="ecs-ledger-tp-")
    items_dir = os.path.join(root, "items")
    out_dir = os.path.join(root, "out")
    items = order_items(spark, sf_dir).select(
        "product_id",
        F.col("event_id").alias("event_seq"),
        "quantity",
        F.col("item_ts").alias("ts"),
    )
    t0 = time.time()
    (
        items.repartition(F.col("product_id"))
        .sortWithinPartitions("ts", "event_seq")
        .write.mode("overwrite")
        .format(fmt)
        .save(items_dir)
    )
    t_stage = time.time() - t0
    seed = {
        r["product_id"]: r["stock"]
        for r in inventory(spark, sf_dir).select("product_id", "stock").collect()
    }
    t0 = time.time()
    q = (
        inventory_ledger_stream(
            spark, items_dir, seed=seed, max_files_per_trigger=None, fmt=fmt
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    t_fold = time.time() - t0
    folded = spark.read.parquet(out_dir).count()
    shutil.rmtree(root, ignore_errors=True)
    return {
        "metric": "ledger_items_per_sec",
        "value": round(folded / t_fold, 1),
        "unit": "items/sec",
        "items": folded,
        "fold_sec": round(t_fold, 1),
        "stage_sec": round(t_stage, 1),
        "staging_fmt": fmt,
        "sf_dir": sf_dir,
    }


def main() -> None:
    args = sys.argv[1:]
    from event_stream_checkout_spark.session import get_session

    spark = get_session("stream-throughput")
    spark.sparkContext.setLogLevel("ERROR")

    if args and args[0] == "--sweep":
        rates = [int(r) for r in args[1].split(",")]
        seconds = int(args[2]) if len(args) > 2 else 15
        for rate in rates:
            print(json.dumps(run_once(spark, rate, seconds)), flush=True)
    elif args and args[0] == "--ledger":
        sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
        fmt = args[2] if len(args) > 2 else "parquet"
        print(json.dumps(run_ledger(spark, sf_dir, fmt)))
    else:
        rate = int(args[0]) if args else 2000
        seconds = int(args[1]) if len(args) > 1 else 15
        print(json.dumps(run_once(spark, rate, seconds)))


if __name__ == "__main__":
    main()
