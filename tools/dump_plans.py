#!/usr/bin/env python
"""Dump .explain("formatted") for a list of query keys to plans/<round>.

Usage: python tools/dump_plans.py <suffix> key [key ...]
       python tools/dump_plans.py before agg_pricing_summary join_multiway

Writes plans/$PLANS_ROUND/<key>_<suffix>.txt (PLANS_ROUND defaults to
r17).  Building a query's DataFrame may
run real jobs for keys that train/collect during construction; run on
an otherwise idle host.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    suffix = sys.argv[1]
    keys = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from event_stream_checkout_spark.registry import load_all
    from event_stream_checkout_spark.session import get_session

    spark = get_session("ecs-plan-dump")
    registry = load_all()
    out_dir = (
        Path(__file__).resolve().parent.parent
        / "plans"
        / os.environ.get("PLANS_ROUND", "r17")
    )
    out_dir.mkdir(parents=True, exist_ok=True)

    for key in keys:
        df = registry[key].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{key}_{suffix}.txt").write_text(buf.getvalue())
        print(f"[plans] wrote {key}_{suffix}.txt", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
