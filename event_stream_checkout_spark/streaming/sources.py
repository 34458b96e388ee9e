"""Pluggable streaming sources for the checkout edge (S1/S2/S3).

The reference's ingress is API Gateway → SQS (src/ingest_order/
app.py:44-48, iac/main.tf:1-24).  In Spark that edge is a streaming
source; everything downstream (the foreachBatch settlement body) is
source-agnostic.  Three kinds:

- ``file``  — JSON-lines directory (the dev/test source; stands in for
  the queue in this container).  One micro-batch per file by default,
  mirroring discrete SQS receive batches.
- ``rate``  — Spark's synthetic rate source mapped onto the wire
  schema; deterministic per (value), used for load tests: N orders/sec
  of well-formed traffic.
- ``kafka`` — the production edge.  Requires the spark-sql-kafka
  package on the cluster (NOT bundled in this container, per the build
  contract); the builder raises a clear error locally but emits the
  exact production configuration — value JSON parsed with the same
  wire schema + corrupt-record channel as the file source.

Every kind returns a streaming DataFrame with the WIRE_SCHEMA columns
(customer_id, items, timestamp, _corrupt_record), so
``CheckoutStream.process_batch`` never knows which edge fed it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def order_stream_source(
    spark: SparkSession,
    kind: str,
    *,
    path: str | None = None,
    rows_per_second: int = 100,
    rows_per_batch: int | None = None,
    kafka_bootstrap: str | None = None,
    kafka_topic: str | None = None,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    from .pipeline import WIRE_SCHEMA

    if kind == "file":
        if path is None:
            raise ValueError("file source requires path=")
        reader = spark.readStream.schema(WIRE_SCHEMA).option(
            "columnNameOfCorruptRecord", "_corrupt_record"
        )
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return reader.json(path)

    if kind == "rate":
        # Deterministic synthetic orders: the payload is a pure function
        # of the rate source's (value), so a replayed offset range
        # regenerates identical records — the same replay-determinism
        # contract the file source gives us.
        # rows_per_batch switches to the bounded rate-micro-batch
        # source: exactly N rows per micro-batch, independent of
        # wall-clock, and it honors Trigger.AvailableNow — so a test
        # can run ONE deterministic batch to completion instead of
        # polling a deadline on a loaded host.
        if rows_per_batch is not None:
            rate = (
                spark.readStream.format("rate-micro-batch")
                .option("rowsPerBatch", rows_per_batch)
                .load()
            )
        else:
            rate = (
                spark.readStream.format("rate")
                .option("rowsPerSecond", rows_per_second)
                .load()
            )
        from ..pipeline import ITEM_TYPE

        item = F.struct(
            F.concat(F.lit("prod-10"), (F.col("value") % 5 + 1).cast("string"))
            .alias("product_id"),
            (F.col("value") % 3 + 1).alias("quantity"),
        )
        return rate.select(
            # Unique customer per value → every order has a distinct
            # content id (measures real settlement throughput, not
            # dedup short-circuiting).
            F.concat(F.lit("cust-"), F.col("value").cast("string")).alias(
                "customer_id"
            ),
            F.array(item).cast(ITEM_TYPE).alias("items"),
            F.date_format(
                F.col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
            ).alias("timestamp"),
            F.lit(None).cast("string").alias("_corrupt_record"),
        )

    if kind == "kafka":
        if not (kafka_bootstrap and kafka_topic):
            raise ValueError("kafka source requires kafka_bootstrap= and kafka_topic=")
        try:
            raw = (
                spark.readStream.format("kafka")
                .option("kafka.bootstrap.servers", kafka_bootstrap)
                .option("subscribe", kafka_topic)
                .option("startingOffsets", "earliest")
                .load()
            )
        except Exception as e:  # kafka connector jar absent in this container
            raise NotImplementedError(
                "kafka source requires the spark-sql-kafka package on the "
                "cluster (--packages org.apache.spark:spark-sql-kafka-0-10_"
                "2.13:<spark-version>); not bundled in this container"
            ) from e
        parsed = raw.select(
            F.from_json(
                F.col("value").cast("string"),
                WIRE_SCHEMA,
                {"columnNameOfCorruptRecord": "_corrupt_record", "mode": "PERMISSIVE"},
            ).alias("r"),
            F.col("value").cast("string").alias("_raw"),
        )
        # from_json puts unparseable payloads in the corrupt column of
        # the struct; surface them exactly like the file source does.
        return parsed.select(
            F.col("r.customer_id").alias("customer_id"),
            F.col("r.items").alias("items"),
            F.col("r.timestamp").alias("timestamp"),
            F.coalesce(F.col("r._corrupt_record"), F.lit(None).cast("string")).alias(
                "_corrupt_record"
            ),
        )

    raise ValueError(f"unknown source kind: {kind!r} (file|rate|kafka)")
