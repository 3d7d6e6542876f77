#!/bin/bash
# Fifth serial TPU queue: catch-up for queues 1-3, whose waiter chains
# died during the long tunnel outage (ROADMAP #26), plus the new grouped
# IVF-PQ bench.  Chains behind the queue-4 runner (pass its pid) so TPU
# jobs stay strictly serial, re-probes the device before every job, and
# folds all logs into the campaign files at the end.
# Usage: bash benchmarks/r3_chip_queue5.sh [logdir] [wait_pid]
set -u
LOG=${1:-/tmp/r3q5}
WAIT=${2:-}
mkdir -p "$LOG"
export PYTHONPATH=/root/.axon_site:/root/repo

if [ -n "$WAIT" ]; then
  echo "$(date +%H:%M:%S) waiting for pid $WAIT (queue-4 chain)" >&2
  while kill -0 "$WAIT" 2>/dev/null; do sleep 60; done
  sleep 30
fi

probe() {
  timeout 120 python - <<'PYEOF' >/dev/null 2>&1
import jax
import numpy as np
x = jax.numpy.ones((8, 8))
np.asarray(jax.device_get(x.sum()))
PYEOF
}

wait_device() {
  until probe; do
    echo "$(date +%H:%M:%S) device down; retry in 180s" >&2
    sleep 180
  done
}

run() {
  name=$1; shift; to=$1; shift
  wait_device
  echo "$(date +%H:%M:%S) START $name" >&2
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  echo "$(date +%H:%M:%S) DONE $name rc=$?" >&2
  sleep 20
}

cd /root/repo

# --- queue-1 jobs (headline evidence first) ---
run bench 5400 python bench.py
# int8 MXU-rate lab: is the v5e's 2x int8 rate reachable via pallas?
# (small, high-value: decides whether the int8 coarse stage can halve)
run int8_mxu 3600 python benchmarks/int8_mxu_lab.py
run ivfg1m_rr 5400 env IVFG_N=1000000 python benchmarks/ivf_grouped_5m.py \
    --nlist 2048 --np 8,16
# new: grouped (cell-major) IVF-PQ vs the per-query kernel at 1M
run ivfpq_grouped 7200 python benchmarks/ivfpq_grouped_tpu.py
run ivfg4m_rr 5400 env IVFG_N=4000000 python benchmarks/ivf_grouped_5m.py \
    --nlist 4096 --np 8,16 --skip-exact
run ivfg5m_rr 5400 env IVFG_N=5000000 python benchmarks/ivf_grouped_5m.py \
    --nlist 4096 --np 4,8 --factor 1.25

# --- queue-3 job ---
run graph_sweep 5400 python benchmarks/graph_sweep.py

# --- queue-2 jobs (long out-of-core runs last) ---
run api_overhead 3600 python benchmarks/api_overhead.py --bf16
run ooc16m 14400 python benchmarks/outofcore_20m.py --rows 16000000 \
    --memmap /tmp/ooc_corpus.f32 --scans 4
run ooc16m_int8 10800 python benchmarks/outofcore_20m.py --rows 16000000 \
    --memmap /tmp/ooc_corpus.f32 --scans 3 --codec int8 --rerank 16 \
    --recall-vs-exact
rm -f /tmp/ooc_corpus.f32.int8.npy /tmp/ooc_corpus.f32.int8.npz
run ooc16m_binary 10800 python benchmarks/outofcore_20m.py --rows 16000000 \
    --memmap /tmp/ooc_corpus.f32 --scans 3 --codec binary --rerank 96 \
    --recall-vs-exact
rm -f /tmp/ooc_corpus.f32.binary.npy /tmp/ooc_corpus.f32.binary.npz
run ooc16m_pq 10800 python benchmarks/outofcore_20m.py --rows 16000000 \
    --memmap /tmp/ooc_corpus.f32 --scans 3 --codec pq --rerank 16 \
    --recall-vs-exact
rm -f /tmp/ooc_corpus.f32 /tmp/ooc_corpus.f32.*.npy /tmp/ooc_corpus.f32.*.npz

bash benchmarks/collect_r3_logs.sh >> "$LOG/collect.log" 2>&1
echo "$(date +%H:%M:%S) QUEUE5 COMPLETE" >&2
