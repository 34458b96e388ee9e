"""Scaled bench point for every registry key OUTSIDE the bench suites.

The r12 verdict's honest caveat: 96 of the registry keys carry measured
sf1/sf10 points (BENCH_DETAIL/BENCH_SF1/BENCH_SF10); the rest rested on
plan contracts + sf0.1 timings.  This tool closes that tail with a
MEASURED one-decade exponent instead of a prose boundedness argument:
every key not in bench.py's HEADLINE/EXTENDED/EXTRA runs at sf0.1 and
sf1 (min over cycles, noop sink — the bench.py methodology), and the
per-key exponent log10(t_sf1/t_sf0.1) lands in BENCH_TAIL.json at the
repo root.  Keys whose frames are calendar/dimension-bounded should
show exponents near 0 (latency-dominated); anything approaching 1.0
(linear wall-clock growth) is flagged for promotion into the real
EXTRA suite.

Usage: python tools/bench_tail.py [--cycles N]
       (sf1 replica expected at /tmp/ecs_sf1 via scripts/make_scaled_sf.py)
"""

from __future__ import annotations

import gc
import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_SMALL = "/root/testdata/sf0.1"
SF_BIG = "/tmp/ecs_sf1"
OUT = Path(__file__).resolve().parents[1] / "BENCH_TAIL.json"


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    cycles = 2
    if "--cycles" in sys.argv:
        cycles = int(sys.argv[sys.argv.index("--cycles") + 1])

    import bench  # the suite lists are the single source of truth

    from event_stream_checkout_spark.registry import load_all
    from event_stream_checkout_spark.session import get_session

    suite = set(bench.HEADLINE) | set(bench.EXTENDED) | set(bench.EXTRA)
    registry = load_all()
    tail = [k for k in sorted(registry) if k not in suite]

    spark = get_session("ecs-bench-tail")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    for sf_label, sf_dir in (("sf0.1", SF_SMALL), ("sf1", SF_BIG)):
        if not Path(sf_dir).exists():
            print(f"missing {sf_dir}; run scripts/make_scaled_sf.py first")
            return 2
        # warmup per corpus
        spark.read.parquet(f"{sf_dir}/region.parquet").count()
        for key in tail:
            if key in ("llm_pca_projection_topk", "llm_pca_residual_topk"):
                # PCA consumers share X50/X52's memoized moment scan;
                # clear so each key pays its own scan (bench.py stance)
                from event_stream_checkout_spark.operators.clustering import (
                    _PCA_MOMENT_CACHE,
                )

                _PCA_MOMENT_CACHE.clear()
            best = float("inf")
            err = None
            for _ in range(cycles):
                t0 = time.perf_counter()
                try:
                    _noop(registry[key].fn(spark, sf_dir))
                except Exception as e:  # noqa: BLE001 — record, continue
                    err = f"{type(e).__name__}: {e}"[:200]
                    break
                best = min(best, time.perf_counter() - t0)
                gc.collect()
                spark.sparkContext._jvm.System.gc()
            rec = results.setdefault(key, {})
            if err:
                # Keep a valid earlier cycle's minimum next to the
                # error instead of discarding it (r13 code-review
                # find: a transient cycle-2 failure was erasing the
                # good cycle-1 point, silently re-opening the
                # unmeasured tail this tool exists to close).
                rec[sf_label] = (
                    round(best, 3) if best != float("inf") else None
                )
                rec["error"] = err
            else:
                rec[sf_label] = round(best, 3)
            print(
                f"[tail] {sf_label} {key}: "
                f"{rec.get(sf_label)}{' ERR ' + err if err else ''}",
                file=sys.stderr,
                flush=True,
            )

    flagged = []
    for key, rec in results.items():
        a, b = rec.get("sf0.1"), rec.get("sf1")
        if a and b and a > 0:
            rec["exponent_1dec"] = round(math.log10(max(b, 1e-3) / a), 3)
            if rec["exponent_1dec"] >= 0.8:
                flagged.append(key)
    payload = {
        "methodology": (
            f"min over {cycles} cycles, noop sink, warm session "
            "(bench.py stance); exponent = log10(t_sf1 / t_sf0.1) — "
            "one decade, so 0=latency-bound, 1=linear"
        ),
        "n_keys": len(tail),
        "flagged_ge_0.8": sorted(flagged),
        "keys": dict(sorted(results.items())),
    }
    OUT.write_text(json.dumps(payload, indent=1) + "\n")
    print(json.dumps({"n_keys": len(tail), "flagged": sorted(flagged)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
