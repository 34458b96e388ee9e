#!/bin/sh
# End-of-round evidence snapshot (r12 verdict item 2 — three rounds
# running the round's BENCH_r{N}.json / CORRECTNESS_r{N}.json sat
# untracked at the snapshot commit).  Run this before ending a round;
# it stages every evidence artifact the judge reads and commits them
# if anything changed.
set -eu
cd "$(dirname "$0")/.."
git add -A -- BENCH_*.json CORRECTNESS_*.json BENCH_TAIL.json \
    LEAKCHECK.json COPYCHECK.json EXPLAIN.md SCALE.md PROGRESS.jsonl \
    2>/dev/null || true
if git diff --cached --quiet; then
    echo "evidence snapshot: nothing new to commit"
else
    git commit -m "Snapshot round evidence (bench/correctness/plans/scale)"
    echo "evidence snapshot: committed"
fi
