#!/usr/bin/env python
"""Measure end-to-end settlement throughput of the streaming shell.

Drives the synthetic rate source (well-formed orders at a target
rate) through the FULL micro-batch body — validation, identity,
first-writer-wins dedup, optimistic settlement, idempotent state
writes — and reports settled orders/sec.

Context: the reference processes orders one SQS message at a time
(batch_size=1, iac/main.tf:30-36) through Lambda + MySQL row locks —
an implied ceiling of ~tens of orders/sec per concurrent consumer
(BASELINE.md).  This measures the Spark engine's equivalent number on
local[*]; on a cluster it scales with executors because every stage
is keyed-parallel.

Usage: python tools/stream_throughput.py [rows_per_second] [seconds]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    rate = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    seconds = int(sys.argv[2]) if len(sys.argv) > 2 else 15

    from event_stream_checkout_spark.session import get_session
    from event_stream_checkout_spark.streaming.pipeline import CheckoutStream
    from event_stream_checkout_spark.streaming.sources import order_stream_source

    spark = get_session("stream-throughput")
    spark.sparkContext.setLogLevel("ERROR")
    state = tempfile.mkdtemp(prefix="ecs-throughput-")
    stream = CheckoutStream(spark, state)
    src = order_stream_source(spark, "rate", rows_per_second=rate)

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

    settled = stream.orders_table().count()
    import json

    print(
        json.dumps(
            {
                "metric": "settled_orders_per_sec",
                "value": round(settled / elapsed, 1),
                "unit": "orders/sec",
                "settled_orders": settled,
                "elapsed_sec": round(elapsed, 1),
                "offered_rate": rate,
            }
        )
    )


if __name__ == "__main__":
    main()
