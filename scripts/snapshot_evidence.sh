#!/bin/sh
# End-of-round evidence snapshot (r12 verdict item 2 — three rounds
# running the round's BENCH_r{N}.json / CORRECTNESS_r{N}.json sat
# untracked at the snapshot commit).  Run this before ending a round;
# it stages every evidence artifact the judge reads and commits them
# if anything changed.
#
# Stage files ONE AT A TIME, only if they exist: `git add` with a
# pathspec list is ATOMIC — one unmatched pathspec (e.g. the
# driver-written LEAKCHECK.json absent mid-round) aborts the whole
# add with exit 128 and NOTHING staged, which a trailing
# `2>/dev/null || true` then silently swallows.  That failure mode
# made the first version of this script a no-op every round — the
# exact miss it was written to prevent (r13 code-review find).
set -eu
cd "$(dirname "$0")/.."
# PROGRESS.jsonl is deliberately absent: it is driver-owned and
# .gitignore'd — adding it errors, and under set -e aborts the run.
for f in BENCH_*.json CORRECTNESS_*.json LEAKCHECK.json COPYCHECK.json \
         EXPLAIN.md SCALE.md; do
    # if/fi, not `[ -e ] &&` — under set -e a trailing false test on
    # the last loop iteration would abort the script.
    if [ -e "$f" ]; then git add -- "$f"; fi
done
if git diff --cached --quiet; then
    echo "evidence snapshot: nothing new to commit"
else
    git commit -m "Snapshot round evidence (bench/correctness/plans/scale)"
    echo "evidence snapshot: committed"
fi
