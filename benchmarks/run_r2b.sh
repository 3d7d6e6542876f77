#!/bin/bash
# Round-2 second benchmark campaign: the on-chip runs still missing from
# r2_raw.jsonl (config5 after the OOM fix, graph-ANN small batch, IVF-PQ
# with the one-hot ADC, int8-cell IVF, serving load, out-of-core 20M,
# BigCollection 10M).  Sequential: one real chip.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
RAW=benchmarks/r2_raw.jsonl
LOG=benchmarks/r2b_run.log
mark() { echo "=== $1 $(date -u +%H:%M:%S)" | tee -a "$LOG"; }

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  mark "$name start"
  timeout "$tmo" "$@" >>"$RAW" 2>>"$LOG"
  mark "$name rc=$? end"
}

run config5            7200 python benchmarks/baseline_r2.py config5
run graph_smallbatch   7200 python benchmarks/graph_ann_smallbatch.py
run ivfpq_onehot       7200 python benchmarks/ivfpq_tpu.py ivfpq
run ivf_int8           7200 python benchmarks/ivfpq_tpu.py ivf_int8
run server_load        3600 python benchmarks/server_load.py
run bigcollection_10m  7200 python benchmarks/outofcore_20m.py --big
run outofcore_20m      7200 python benchmarks/outofcore_20m.py
mark "bench.py start"
timeout 3600 python bench.py > /tmp/bench_r2b.json 2>>"$LOG"
mark "bench.py rc=$? end"
cat /tmp/bench_r2b.json >>"$LOG"
echo CAMPAIGN2_DONE | tee -a "$LOG"
