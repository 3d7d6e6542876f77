#!/bin/bash
# Fourth campaign: config5 at deeper binary candidate pools — the rr=128
# run measured recall@10 0.697 on the clustered 5M corpus (ROADMAP #15's
# collapse at scale); sweep deeper to find the recall/latency point.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
RAW=benchmarks/r2_raw.jsonl
LOG=benchmarks/r2d_run.log
mark() { echo "=== $1 $(date -u +%H:%M:%S)" | tee -a "$LOG"; }
for i in $(seq 1 480); do
  grep -q CAMPAIGN3_DONE benchmarks/r2c_run.log 2>/dev/null && break
  sleep 30
done
mark "r2d begin"
mark "config5_rr384 start"
timeout 7200 python benchmarks/baseline_r2.py config5 --rerank 384 >>"$RAW" 2>>"$LOG"
mark "config5_rr384 rc=$? end"
python benchmarks/consolidate_r2.py >>"$LOG" 2>&1
echo CAMPAIGN4_DONE | tee -a "$LOG"
