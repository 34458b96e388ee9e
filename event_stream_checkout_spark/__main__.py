"""CLI for the engine: list, run, and explain registered queries.

    python -m event_stream_checkout_spark list
    python -m event_stream_checkout_spark run txn_settlement [--sf-dir DIR] [-n 20]
    python -m event_stream_checkout_spark explain join_multiway [--sf-dir DIR]
    python -m event_stream_checkout_spark oracle txn_settlement
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="event_stream_checkout_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries")
    for name in ("run", "explain", "oracle"):
        p = sub.add_parser(name)
        p.add_argument("query")
        if name != "oracle":
            p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        if name == "run":
            p.add_argument("-n", type=int, default=20, help="rows to show")
    args = ap.parse_args(argv)

    from .registry import load_all

    registry = load_all()
    if args.cmd == "list":
        for key, q in sorted(registry.items()):
            oracle = "oracle" if q.oracle else "rows-only"
            first = (q.doc or "").split(". ")[0].strip()
            print(f"{key:32s} [{oracle}] {first}")
        return 0

    if args.query not in registry:
        print(f"unknown query: {args.query!r} (see `list`)", file=sys.stderr)
        return 2
    q = registry[args.query]

    if args.cmd == "oracle":
        print(q.oracle or "-- no oracle (rows-only check)")
        return 0

    from .session import get_session

    spark = get_session("ecs-cli")
    df = q.fn(spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.n, truncate=False)
        print(f"({df.count()} rows total)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
