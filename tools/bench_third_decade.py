"""Third-decade scale point for the worst-exponent pair/graph keys.

The r13 verdict's item 3: the 100 TB claim rested on two measured
decades (sf0.1 → sf10); the ≥0.5-exponent family — all capped pair
expansions or graph closures whose caps could, in principle, stop
holding as density grows — gets a MEASURED third decade here
(sf10 → sf100, the sf100 replica built by scripts/make_scaled_sf.py
from the sf10 one with a disjoint word-suffix alphabet so cross-copy
shingles stay collision-free).

Methodology matches tools/bench_tail.py: min over cycles, noop sink,
warm session, per-key exponent = log10(t_sf100 / t_sf10).  Anything
≥ 0.8 (approaching linear wall-clock growth per data decade on 32
fixed cores — superlinear work) is flagged.

Usage: python tools/bench_third_decade.py [--cycles N] [KEY ...]
       (defaults: cycles=2, the five keys the r13 verdict names)
"""

from __future__ import annotations

import gc
import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF10 = "/tmp/ecs_sf10"
SF100 = "/tmp/ecs_sf100"
OUT = Path(__file__).resolve().parents[1] / "BENCH_THIRD_DECADE.json"

DEFAULT_KEYS = [
    "llm_containment_pairs",      # 0.539 over sf0.1->sf10
    "llm_lsh_tuning",             # 0.526
    "graph_copurchase_triangles",  # 0.512
    "llm_dup_span_coverage",      # 0.518
    "llm_minhash_calibration",    # 0.503
    # r15 additions — the next sf1->sf10 exponent tier (r14 verdict
    # item 5) plus the new pay-once probe path:
    "graph_copurchase_local_clustering",  # 0.454 over sf1->sf10
    "evt_peak_concurrency",               # 0.487
    "llm_item_cf_topk",                   # 0.424
    "graph_link_prediction",              # 0.402
    "llm_split_leakage",                  # 0.412
    "llm_minhash_calibration_persisted",  # X58b store probe (r15)
    "llm_cross_source_dups",              # X49 span-store probe (r16)
    "llm_lsh_tuning_persisted",           # X69b pair-store probe (r16)
    "llm_containment_pairs_persisted",    # X54b bucketed-store probe (r16)
]


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    cycles = 2
    argv = sys.argv[1:]
    if "--cycles" in argv:
        i = argv.index("--cycles")
        cycles = int(argv[i + 1])
        del argv[i : i + 2]
    keys = argv or DEFAULT_KEYS

    from event_stream_checkout_spark.registry import load_all
    from event_stream_checkout_spark.session import get_session

    registry = load_all()
    spark = get_session("ecs-bench-3dec")
    spark.sparkContext.setLogLevel("ERROR")

    # Merge-into semantics: re-running with a KEY subset refreshes just
    # those rows, so a long run can be split per key without losing the
    # rest of the file.
    results: dict[str, dict] = {}
    if OUT.exists():
        try:
            results = json.loads(OUT.read_text()).get("keys", {})
        except ValueError:
            results = {}
    errored: set[str] = set()
    for sf_label, sf_dir in (("sf10", SF10), ("sf100", SF100)):
        if not Path(sf_dir).exists():
            print(f"missing {sf_dir}; run scripts/make_scaled_sf.py first")
            return 2
        spark.read.parquet(f"{sf_dir}/region.parquet").count()
        for key in keys:
            if key in errored:
                continue  # both labels already nulled; keep the tag
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
            rec[sf_label] = round(best, 3) if best != float("inf") else None
            if err:
                # Clear BOTH labels (ADVICE r14): leaving the other
                # label's timing — from earlier in this run or merged
                # in from a prior file — would let a later fixed run
                # pair timings from different code versions into one
                # exponent.  The error tag marks the key for a full
                # re-measure.
                rec["sf10"] = rec["sf100"] = None
                # A merged-in exponent from a prior run must not
                # survive next to this run's error (r15 review: the
                # recompute loop skips None pairs, so it would never
                # be overwritten — a stale >=0.8 exponent displayed
                # while the key silently drops out of the flag list).
                rec.pop("exponent_3rd_dec", None)
                rec["error"] = err
                errored.add(key)
            else:
                rec.pop("error", None)  # clear a stale merged-in error
            print(
                f"[3dec] {sf_label} {key}: "
                f"{rec.get(sf_label)}{' ERR ' + err if err else ''}",
                file=sys.stderr,
                flush=True,
            )

    flagged = []
    for key, rec in results.items():
        a, b = rec.get("sf10"), rec.get("sf100")
        # `is not None`, not truthiness (ADVICE r14): a legitimate
        # timing rounded to 0.0 is a measurement, not a gap — floor
        # both sides at 1 ms instead of dropping the exponent.
        if a is not None and b is not None:
            rec["exponent_3rd_dec"] = round(
                math.log10(max(b, 1e-3) / max(a, 1e-3)), 3
            )
            if rec["exponent_3rd_dec"] >= 0.8:
                flagged.append(key)
    payload = {
        "methodology": (
            f"min over {cycles} cycles, noop sink, warm session "
            "(bench.py stance); exponent = log10(t_sf100 / t_sf10) — "
            "the THIRD measured decade for the >=0.5-exponent family"
        ),
        "n_keys": len(results),
        "flagged_ge_0.8": sorted(flagged),
        "keys": dict(sorted(results.items())),
    }
    OUT.write_text(json.dumps(payload, indent=1) + "\n")
    print(json.dumps({"n_keys": len(keys), "flagged": sorted(flagged)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
