#!/bin/sh
# r13 evidence pipeline — runs every Spark workload SEQUENTIALLY (the
# bench-hygiene rule: concurrent Spark jobs corrupt the timings the
# judge reads).  Logs land in /tmp/r13_logs; a STATUS line per stage.
set -u
cd "$(dirname "$0")/.."
L=/tmp/r13_logs
mkdir -p "$L"
stage() { echo "[$(date +%H:%M:%S)] STAGE $1" | tee -a "$L/STATUS"; }

stage "null_sweep start"
python tools/null_sweep.py >"$L/null_sweep.log" 2>&1
echo "null_sweep exit=$?" >>"$L/STATUS"

stage "pytest start"
python -m pytest tests/ -q >"$L/pytest.log" 2>&1
echo "pytest exit=$?" >>"$L/STATUS"

stage "explain_report start"
python tools/explain_report.py >"$L/explain.log" 2>&1
echo "explain exit=$?" >>"$L/STATUS"

stage "bench_tail start"
python tools/bench_tail.py --cycles 2 >"$L/bench_tail.log" 2>&1
echo "bench_tail exit=$?" >>"$L/STATUS"

stage "bench sf1 start"
SPARK_GRAFT_SF_DIR=/tmp/ecs_sf1 python bench.py >"$L/bench_sf1.log" 2>&1
echo "bench_sf1 exit=$?" >>"$L/STATUS"

stage "bench sf10 start"
SPARK_GRAFT_SF_DIR=/tmp/ecs_sf10 python bench.py >"$L/bench_sf10.log" 2>&1
echo "bench_sf10 exit=$?" >>"$L/STATUS"

stage "bench sf0.1 start (last - embeds fresh exponents)"
python bench.py >"$L/bench_sf01.log" 2>&1
echo "bench_sf01 exit=$?" >>"$L/STATUS"

stage "stream_throughput sweep start"
python tools/stream_throughput.py --sweep 200000,400000,600000,800000,1000000 40 \
    >"$L/stream_sweep.log" 2>&1
echo "stream_sweep exit=$?" >>"$L/STATUS"

stage "ALL DONE"
