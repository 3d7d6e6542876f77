#!/bin/bash
# Fifth campaign: config5 with the int8 two-stage at 5M (the 1M champion
# at the scale where binary needs recall-killing candidate depth).
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
RAW=benchmarks/r2_raw.jsonl
LOG=benchmarks/r2e_run.log
mark() { echo "=== $1 $(date -u +%H:%M:%S)" | tee -a "$LOG"; }
for i in $(seq 1 480); do
  grep -q CAMPAIGN4_DONE benchmarks/r2d_run.log 2>/dev/null && break
  sleep 30
done
mark "config5_int8 start"
timeout 7200 python benchmarks/baseline_r2.py config5_int8 >>"$RAW" 2>>"$LOG"
mark "config5_int8 rc=$? end"
python benchmarks/consolidate_r2.py >>"$LOG" 2>&1
echo CAMPAIGN5_DONE | tee -a "$LOG"
