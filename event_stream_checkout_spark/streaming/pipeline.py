"""Structured Streaming shell over the batch checkout pipeline
(SURVEY.md §7 M3) — the Spark restatement of the reference's
API GW → SQS → Lambda → MySQL → SQS → Lambda dataflow as ONE streaming
DAG:

  file/JSON source (S1/S2, standing in for the HTTP+queue edge)
    → from_json with explicit schema + corrupt-record channel (P3)
    → foreachBatch( validate → identity → dedup → settle )  (M2 module)
        ├─ orders table, append, first-writer-wins   (S6)
        ├─ inventory, versioned atomic swap          (T1/S6)
        ├─ OrderProcessed events, append             (S4/S5)
        ├─ rejected + corrupt rows → quarantine      (P2/S11/T4)
        └─ notifications: status=='PROCESSED' proj   (P4/P5/S9)

Delivery semantics: the file source is at-least-once into
foreachBatch; every write is keyed-idempotent (orders anti-joined
against the table before append; inventory written as a new version
then atomically published), so replays of a batch are no-ops — the
exact contract the reference builds from SQS redelivery + INSERT
IGNORE (src/order_processor/app.py:45-48,66-75).

State bounding (documented divergence, SURVEY.md §2 T2): the
reference dedups forever via the orders PK; this shell dedups against
the accumulated orders table (same semantics) and additionally
supports dropDuplicatesWithinWatermark for bounded in-flight state at
100 TB.

At scale: swap the file source for Kafka and the parquet state tables
for a transactional table format; the foreachBatch body is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..pipeline import ITEM_TYPE, run_checkout_batch, seed_inventory
from ..session import configure

WIRE_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.StringType(), True),
        T.StructField("items", ITEM_TYPE, True),
        T.StructField("timestamp", T.StringType(), True),  # ISO-8601, no TZ
        T.StructField("_corrupt_record", T.StringType(), True),
    ]
)


class CheckoutStream:
    """File-source streaming checkout with parquet-backed state."""

    def __init__(self, spark: SparkSession, state_dir: str, mode: str = "replay_global"):
        self.spark = configure(spark)
        self.state = state_dir
        self.mode = mode
        self.orders_dir = os.path.join(state_dir, "orders")
        self.inv_root = os.path.join(state_dir, "inventory")
        self.events_dir = os.path.join(state_dir, "processed_events")
        self.quarantine_dir = os.path.join(state_dir, "quarantine")
        self.notify_dir = os.path.join(state_dir, "notifications")
        self.checkpoint_dir = os.path.join(state_dir, "_checkpoint")

    # -- state table accessors -------------------------------------------

    def current_inventory(self) -> DataFrame:
        versions = self._inventory_versions()
        if not versions:
            return seed_inventory(self.spark)
        latest = os.path.join(self.inv_root, f"v{max(versions)}")
        return self.spark.read.parquet(latest)

    def _inventory_versions(self) -> list[int]:
        if not os.path.isdir(self.inv_root):
            return []
        out = []
        for name in os.listdir(self.inv_root):
            # A version is visible only once fully committed (_SUCCESS).
            if name.startswith("v") and os.path.exists(
                os.path.join(self.inv_root, name, "_SUCCESS")
            ):
                out.append(int(name[1:]))
        return out

    def existing_orders(self) -> DataFrame | None:
        if not os.path.isdir(self.orders_dir) or not os.listdir(self.orders_dir):
            return None
        return self.spark.read.parquet(self.orders_dir)

    def orders_table(self) -> DataFrame:
        df = self.existing_orders()
        return (
            df
            if df is not None
            else self.spark.createDataFrame(
                [],
                "order_id string, customer_id string, items string, "
                "status string, created_at timestamp_ntz, "
                "processed_at timestamp_ntz",
            )
        )

    # -- the micro-batch body (pure M2 logic + idempotent writes) --------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # Cache before touching _corrupt_record: Spark disallows
        # queries over raw JSON that reference only the corrupt-record
        # column, and we also want one stable snapshot per batch.
        batch_df = batch_df.cache()
        corrupt = batch_df.filter(F.col("_corrupt_record").isNotNull())
        parsed = (
            batch_df.filter(F.col("_corrupt_record").isNull())
            .drop("_corrupt_record")
            .withColumn(
                "timestamp",
                F.to_timestamp_ntz(
                    F.col("timestamp"), F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
                ),
            )
        )
        split, res = run_checkout_batch(
            self.spark,
            parsed,
            inventory=self.current_inventory(),
            existing_orders=self.existing_orders(),
            mode=self.mode,
        )
        # Materialize ALL decisions before any write (T3: decide, then
        # apply).  The settlement outputs are lazy plans over the very
        # directories the writes below mutate, and Spark invalidates
        # caches by path on write (recacheByPath) — so a plain cache()
        # would silently recompute the inventory AFTER the orders
        # append and see its own batch.  localCheckpoint cuts lineage,
        # pinning the pre-batch snapshot.
        new_orders = res.orders.localCheckpoint()
        new_inventory = res.inventory.localCheckpoint()
        processed = res.processed_events.localCheckpoint()
        if new_orders.count() > 0:
            new_orders.write.mode("append").parquet(self.orders_dir)
            # Versioned write + _SUCCESS marker = atomic publish; a
            # replayed batch rewrites the same version (idempotent).
            new_inventory.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(self.inv_root, f"v{batch_id}")
            )
            processed.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(self.events_dir)
            # Notification stage (P4/P5): the reference notifier's
            # filter+projection, errors swallowed per its policy.
            try:
                (
                    processed.filter(F.col("status") == "PROCESSED")
                    .select("order_id", "customer_id", "status")
                    .write.mode("append")
                    .parquet(self.notify_dir)
                )
            except Exception:
                pass  # notifier swallows (notification_sender/app.py:24-26)
        bad = split.rejected.select(
            F.lit("VALIDATION").alias("reason"),
            F.to_json(F.struct("customer_id", "items", "timestamp")).alias("payload"),
        ).unionByName(
            corrupt.select(
                F.lit("MALFORMED_JSON").alias("reason"),
                F.col("_corrupt_record").alias("payload"),
            )
        )
        if bad.count() > 0:
            bad.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
                self.quarantine_dir
            )
        batch_df.unpersist()

    # -- wiring ----------------------------------------------------------

    def source(self, input_dir: str) -> DataFrame:
        return (
            self.spark.readStream.schema(WIRE_SCHEMA)
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .option("maxFilesPerTrigger", 1)  # micro-batch per file
            .json(input_dir)
        )

    def run_available(self, input_dir: str) -> None:
        """Process everything currently in input_dir, then stop
        (availableNow trigger — the batch-replay entry point)."""
        q = (
            self.source(input_dir)
            .writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def streaming_tumbling_counts(
    spark: SparkSession,
    events_dir: str,
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """True streaming windowed aggregation (T6/T7): parquet stream →
    watermark → tumbling 1h counts. Used by the batch/stream
    equivalence test; at scale this is the standing dashboard query."""
    configure(spark)
    reader = spark.readStream.schema(
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_dir)
    # Watermarks require TIMESTAMP (instant) semantics; with the session
    # pinned to UTC the cast preserves wall clock, and we project the
    # window start back to NTZ for engine-wide consistency.
    return (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("wstart"),
            "event_type",
            "n",
        )
    )


def streaming_purchase_enrichment(
    spark: SparkSession, events_dir: str, join_window: str = "1 hour"
) -> DataFrame:
    """Stream-stream equi-join with watermarks (T6/J2's true streaming
    form): purchases joined to the same user's signups within a time
    window.  Both sides carry watermarks so the join state is bounded —
    the 100 TB requirement for any standing stream-stream join.
    """
    configure(spark)

    def src():
        return (
            spark.readStream.schema(
                "event_id long, ts timestamp_ntz, user_id long, "
                "event_type string, value double, props string"
            )
            .parquet(events_dir)
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )

    purchases = (
        src()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    signups = (
        src()
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_id"),
            F.col("user_id").alias("s_user_id"),
            F.col("ts").alias("signup_ts"),
        )
        .withWatermark("signup_ts", "2 hours")
    )
    return purchases.join(
        signups,
        (F.col("user_id") == F.col("s_user_id"))
        & (F.col("signup_ts") <= F.col("purchase_ts"))
        & (F.col("signup_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {join_window}")),
        "inner",
    ).select(
        "purchase_id",
        "user_id",
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
        "signup_id",
        F.col("signup_ts").cast("timestamp_ntz").alias("signup_ts"),
        "value",
    )


def streaming_dedup_within_watermark(
    spark: SparkSession, events_dir: str, delay: str = "2 hours"
) -> DataFrame:
    """In-stream keyed dedup with bounded state (T2's scalable mode):
    dropDuplicatesWithinWatermark keeps the seen-set only within the
    watermark delay — the documented divergence from the reference's
    unbounded PK dedup, for streams where keys can't recur later than
    the delay."""
    configure(spark)
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string"
        )
        .parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    return (
        stream.withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.col("ts").cast("timestamp_ntz").alias("ts"),
        )
    )
