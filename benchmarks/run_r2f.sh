#!/bin/bash
# Sixth campaign: 20M out-of-core steady state (first run validated
# correctness then host-OOMed before the timed pass; the searcher now
# bounds in-flight tiles).
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
mark() { echo "=== $1 $(date -u +%H:%M:%S)" | tee -a benchmarks/r2f_run.log; }
mark "outofcore_20m_rerun start"
timeout 10000 python benchmarks/outofcore_20m.py >> benchmarks/r2_raw.jsonl 2>>benchmarks/r2f_run.log
mark "outofcore_20m_rerun rc=$? end"
python benchmarks/consolidate_r2.py >> benchmarks/r2f_run.log 2>&1
echo CAMPAIGN6_DONE | tee -a benchmarks/r2f_run.log
