#!/bin/bash
# Fold the round-3 chip-queue logs into the campaign jsonl files and
# rebuild results_r3_tpu.json.  Idempotent: campaign files are appended
# and the consolidator keeps the LAST occurrence of each experiment name.
# Usage: bash benchmarks/collect_r3_logs.sh
set -u
cd "$(dirname "$0")"

fold() {  # fold <log> <campaign.jsonl>
  [ -f "$1" ] || { echo "skip $1 (missing)"; return; }
  grep '^{' "$1" >> "$2" && echo "folded $1 -> $2"
}

fold /tmp/r3q/ivfg4m_rr.log    r3_ivf_grouped_4m.jsonl
fold /tmp/r3q/ivfg1m_rr.log    r3_ivf_grouped.jsonl
fold /tmp/r3q/ivfg5m_rr.log    r3_ivf_grouped_5m.jsonl
fold /tmp/r3q2/api_overhead.log r3_api_overhead_bf16.jsonl
fold /tmp/r3q2/ooc16m.log      r3_outofcore_20m.jsonl
fold /tmp/r3q2/ooc16m_int8.log   r3_outofcore_int8.jsonl
fold /tmp/r3q2/ooc16m_binary.log r3_outofcore_binary.jsonl
fold /tmp/r3q2/ooc16m_pq.log     r3_outofcore_pq.jsonl
fold /tmp/r3q3/graph_sweep.log r3_graph_sweep.jsonl

# queue 4 (int4 sweeps) + queue 5 (catch-up for the dead q1-q3 waiters)
fold /tmp/r3q4/int4_1m.log     r3_int4_1m.jsonl
fold /tmp/r3q4/int4_5m.log     r3_int4_5m.jsonl
fold /tmp/r3q5/ivfg4m_rr.log   r3_ivf_grouped_4m.jsonl
fold /tmp/r3q5/ivfg1m_rr.log   r3_ivf_grouped.jsonl
fold /tmp/r3q5/ivfg5m_rr.log   r3_ivf_grouped_5m.jsonl
fold /tmp/r3q5/ivfpq_grouped.log r3_ivfpq_grouped.jsonl
fold /tmp/r3q5/int8_mxu.log    r3_int8_mxu.jsonl
fold /tmp/r3q5/graph_sweep.log r3_graph_sweep.jsonl
fold /tmp/r3q5/api_overhead.log r3_api_overhead_bf16.jsonl
fold /tmp/r3q5/ooc16m.log      r3_outofcore_20m.jsonl
fold /tmp/r3q5/ooc16m_int8.log   r3_outofcore_int8.jsonl
fold /tmp/r3q5/ooc16m_binary.log r3_outofcore_binary.jsonl
fold /tmp/r3q5/ooc16m_pq.log     r3_outofcore_pq.jsonl

python consolidate_r3.py
