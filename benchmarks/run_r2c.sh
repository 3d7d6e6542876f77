#!/bin/bash
# Third campaign: wait for run_r2b.sh to finish, then re-run the two
# benchmarks whose first attempts OOMed (config5: eager bf16->f32 astype
# in corpus_stats; ivfpq: full-corpus residual materialization in build),
# both fixed since.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
RAW=benchmarks/r2_raw.jsonl
LOG=benchmarks/r2c_run.log
mark() { echo "=== $1 $(date -u +%H:%M:%S)" | tee -a "$LOG"; }

# wait (up to 4 h) for the r2b campaign to finish
for i in $(seq 1 480); do
  grep -q CAMPAIGN2_DONE benchmarks/r2b_run.log 2>/dev/null && break
  sleep 30
done
mark "r2c begin (r2b done=$(grep -c CAMPAIGN2_DONE benchmarks/r2b_run.log 2>/dev/null))"

run() {
  local name=$1 tmo=$2; shift 2
  mark "$name start"
  timeout "$tmo" "$@" >>"$RAW" 2>>"$LOG"
  mark "$name rc=$? end"
}

run config5_rerun  7200 python benchmarks/baseline_r2.py config5
run ivfpq_rerun    7200 python benchmarks/ivfpq_tpu.py ivfpq
run server_load    3600 python benchmarks/server_load.py
python benchmarks/consolidate_r2.py >>"$LOG" 2>&1
echo CAMPAIGN3_DONE | tee -a "$LOG"
