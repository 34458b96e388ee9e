"""EWMA plain-vs-chunked crossover bench (r8 verdict item 5).

Times E9's direct closed form (len² pairs per type) against E9b's
chunk-and-carry plan (C²·len/C pairs + a #chunks boundary solve) on
synthetic daily series of growing horizon, through the same noop-sink
materialization bench.py uses.  The measured crossover justifies the
registered E9 delegation threshold (_EWMA_DELEGATE_LEN): below it the
closed form's flat plan wins on action latency; above it the pair
count (len²/2 per type) dominates and the chunked plan's bounded
joins take over.

Usage: python tools/ewma_crossover.py [day_counts_csv]
Prints one JSON line {"horizon_days": {N: {"plain": s, "chunked": s,
"pairs_plain": .., "pairs_chunked": ..}}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from datetime import datetime, timedelta
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pandas as pd  # noqa: E402

from event_stream_checkout_spark.operators.events_analytics import (  # noqa: E402
    _EWMA_CHUNK,
    _ewma_chunked_from_daily,
    _ewma_plain_from_daily,
)
from event_stream_checkout_spark.session import get_session  # noqa: E402
from event_stream_checkout_spark.tables import load_table  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

T0 = datetime(2000, 1, 1, 12, 0, 0)
N_TYPES = 4


def _mk(sf_dir: str, n_days: int) -> None:
    shutil.rmtree(sf_dir, ignore_errors=True)
    os.makedirs(sf_dir)
    rows = []
    eid = 0
    for t in range(N_TYPES):
        for d in range(n_days):
            eid += 1
            rows.append(
                (eid, T0 + timedelta(days=d), 1, f"type-{t}", 1.0, "{}")
            )
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(os.path.join(sf_dir, "events.parquet"))


def main() -> None:
    horizons = (
        tuple(int(x) for x in sys.argv[1].split(","))
        if len(sys.argv) > 1
        else (256, 1024, 4096)
    )
    spark = get_session("ewma-crossover")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[int, dict] = {}
    for n_days in horizons:
        sf_dir = f"/tmp/ecs_ewma_{n_days}"
        _mk(sf_dir, n_days)
        daily = (
            load_table(spark, sf_dir, "events")
            .groupBy("event_type", F.col("ts").cast("date").alias("day"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        timings = {}
        for name, fn in (
            ("plain", _ewma_plain_from_daily),
            ("chunked", _ewma_chunked_from_daily),
        ):
            best = None
            for _ in range(2):  # min of two — absorbs first-run setup
                t0 = time.perf_counter()
                fn(daily).write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
        out[n_days] = {
            **timings,
            "pairs_plain": N_TYPES * n_days * (n_days + 1) // 2,
            "pairs_chunked": N_TYPES
            * (n_days // _EWMA_CHUNK + 1)
            * _EWMA_CHUNK
            * (_EWMA_CHUNK + 1)
            // 2,
        }
        shutil.rmtree(sf_dir, ignore_errors=True)
    print(json.dumps({"horizon_days": out}))
    spark.stop()


if __name__ == "__main__":
    main()
