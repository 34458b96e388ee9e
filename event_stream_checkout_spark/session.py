"""SparkSession factory + defensive per-session configuration.

The driver may hand us an already-built session, so every conf we rely
on is (re)applied at runtime via :func:`configure`.  All of these are
runtime-settable SQL confs in Spark 4.x.

Scale notes (100 TB design):
- AQE on: runtime shuffle coalescing + skew-join splitting replace any
  hand-tuned partition counts when this runs on a real cluster.
- ``nanosAsLong`` lets us scan parquet TIMESTAMP(NANOS) columns (the
  driver's ``events`` table) without a driver-side rewrite; the loader
  converts ns→µs column-side (see tables.py) so the scan stays
  distributed and prunable.
- Session timezone pinned to UTC: the reference emits naive-UTC
  ISO-8601 timestamps (src/ingest_order/app.py:39); we standardize on
  TIMESTAMP_NTZ so results are independent of driver-session TZ.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to any session we touch.
_RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # local[32] guidance: match shuffle width to cores; on a real
    # cluster AQE coalesces this down/up as needed.
    "spark.sql.shuffle.partitions": "32",
    # AQE coalescing only ever MERGES post-shuffle partitions — it
    # never splits an oversized one — so the pre-coalesce width must
    # be provisioned for the largest corpus the session will see.  At
    # 32 the r14 third-decade bench (sf100) sorted ~8M-row partitions
    # per reducer and spilled (llm_containment_pairs 424 s → 287 s
    # just from this conf).  256 initial / AQE-coalesced costs the
    # sub-second sf0.1 keys nothing (measured in bench.py r14: the
    # coalescer folds them back to a handful of partitions) and is
    # the shape that survives a 1000-executor cluster, where the same
    # number would be thousands.
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "256",
    # NOTE: no global spark.sql.files.minPartitionNum.  Round 4 A/B
    # (scripts/bisect_minpart.py, n=7 paired, sf0.1) showed the global
    # 32-way scan minimum taxed every sub-second query 10-17%
    # (32-task scheduling overhead on 0.3 s scans) while the queries
    # that NEED wide scans for compute-heavy scan-local expressions
    # already get them via tables.with_min_scan_parallelism at their
    # call sites — which is also the shape that survives 100 TB (a
    # runtime-checked no-op once split count exceeds parallelism).
    # 10 MB broadcast default is conservative; our dims (region/nation/
    # part slices, inventory) are tiny — AQE also converts to broadcast
    # at runtime when sizes allow.
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply engine confs to an existing session (driver-provided ok)."""
    for key, value in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # A static conf on this build — harmless to skip; the
            # loader has fallbacks for the only critical one (nanos).
            pass
    return spark


def get_session(app_name: str = "event_stream_checkout_spark") -> SparkSession:
    """Build (or fetch) the canonical local session."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for key, value in _RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return configure(spark)
