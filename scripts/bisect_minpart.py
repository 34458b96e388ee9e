#!/usr/bin/env python
"""A/B bisect: is the global ``spark.sql.files.minPartitionNum=32``
(session.py) responsible for the uniform ~10% regressions on
sub-second bench queries seen in BENCH_r03 vs r02?

Runs the headline suite with the conf ON (32) and OFF (Spark default =
leave unset) interleaved n times in ONE session — the conf is
runtime-settable and scan partitioning is decided at planning time, so
toggling per-iteration gives paired samples that cancel JVM/OS drift.
Prints per-query min+median for both arms and the delta.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = int(os.environ.get("BISECT_N", "7"))
CONF = "spark.sql.files.minPartitionNum"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import HEADLINE
    from event_stream_checkout_spark.registry import load_all
    from event_stream_checkout_spark.session import get_session

    spark = get_session("ecs-bisect")
    registry = load_all()

    # Warmup (same shape as bench.py).
    from pyspark.sql import functions as F

    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .groupBy("l_returnflag").agg(F.sum("l_quantity"))
        .write.mode("overwrite").format("noop").save()
    )

    samples: dict[tuple[str, str], list[float]] = {}
    for i in range(N):
        for mode in ("on", "off"):
            if mode == "on":
                spark.conf.set(CONF, "32")
            else:
                spark.conf.unset(CONF)
            for key in HEADLINE:
                t0 = time.perf_counter()
                registry[key].fn(spark, sf_dir).write.mode(
                    "overwrite"
                ).format("noop").save()
                samples.setdefault((key, mode), []).append(
                    time.perf_counter() - t0
                )
        print(f"iter {i + 1}/{N} done", file=sys.stderr, flush=True)

    out = {}
    for key in HEADLINE:
        on = samples[(key, "on")]
        off = samples[(key, "off")]
        out[key] = {
            "on_min": round(min(on), 3),
            "off_min": round(min(off), 3),
            "on_med": round(statistics.median(on), 3),
            "off_med": round(statistics.median(off), 3),
            "delta_min_pct": round(100 * (min(on) - min(off)) / min(off), 1),
        }
    tot_on = sum(v["on_min"] for v in out.values())
    tot_off = sum(v["off_min"] for v in out.values())
    print(json.dumps({
        "n": N,
        "suite_on_min": round(tot_on, 3),
        "suite_off_min": round(tot_off, 3),
        "queries": out,
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
