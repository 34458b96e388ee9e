"""Re-measure the three r14 suite regressions and bisect the suspect.

The r14 verdict (item 4) flagged three keys whose refreshed
BENCH_DETAIL timings rose against r13 with no code change:
llm_ivfpq_topk +26%, llm_pq_rerank_topk +18%, agg_market_share +16%.
The only session-wide change that round was
``spark.sql.adaptive.coalescePartitions.initialPartitionNum = 256``
(sized for the sf100 third-decade sorts).  Both PQ keys run many tiny
shuffles (k-means codebook iterations over sub-MB frames), the exact
shape where a 256-way pre-coalesce width buys nothing and taxes every
exchange with task-scheduling overhead at sf0.1.

This script measures each key at sf0.1 under BOTH settings of that
one conf (it is a runtime SQL conf, so one session A/Bs it cleanly),
interleaved cycles / min-per-cell (the bench.py methodology), and
prints a verdict per key: noise (within 10% of r13 under the current
conf), conf-regression (256 slow + 32 within 10% of r13), or real
(slow under both — needs a code bisect).

Usage: python scripts/remeasure_regressions.py [--cycles N]
"""

from __future__ import annotations

import gc
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from event_stream_checkout_spark.registry import load_all  # noqa: E402
from event_stream_checkout_spark.session import get_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
CONF = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
# r13 BENCH_DETAIL values (commit 100ca39~1), the pre-conf baseline.
R13 = {
    "llm_ivfpq_topk": 4.943,
    "llm_pq_rerank_topk": 4.441,
    "agg_market_share": 1.085,
}
KEYS = ("llm_ivfpq_topk", "llm_pq_rerank_topk", "agg_market_share")


def main() -> int:
    cycles = 3
    if "--cycles" in sys.argv:
        i = sys.argv.index("--cycles")
        try:
            cycles = int(sys.argv[i + 1])
        except (IndexError, ValueError):
            raise SystemExit(
                "usage: remeasure_regressions.py [--cycles N]"
            ) from None
    spark = get_session("ecs-remeasure-regressions")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()  # warm JVM
    best: dict[tuple[str, str], float] = {}
    for _c in range(cycles):
        for key in KEYS:
            for setting in ("256", "32"):
                spark.conf.set(CONF, setting)
                t0 = time.perf_counter()
                reg[key].fn(spark, SF_DIR).write.mode("overwrite").format(
                    "noop"
                ).save()
                t = time.perf_counter() - t0
                cell = (key, setting)
                best[cell] = min(best.get(cell, float("inf")), t)
                print(
                    f"[remeasure] cycle {_c} {key} init={setting}: {t:.3f}s",
                    file=sys.stderr,
                    flush=True,
                )
                gc.collect()
                spark.sparkContext._jvm.System.gc()
    spark.conf.set(CONF, "256")  # restore the session default
    out = {}
    for key in KEYS:
        t256 = round(best[(key, "256")], 3)
        t32 = round(best[(key, "32")], 3)
        r13 = R13[key]
        if t256 <= r13 * 1.10:
            verdict = "noise"
        elif t32 <= r13 * 1.10:
            verdict = "conf_regression_initialPartitionNum"
        else:
            verdict = "real_code_bisect_needed"
        out[key] = {
            "r13": r13,
            "init256": t256,
            "init32": t32,
            "verdict": verdict,
        }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
