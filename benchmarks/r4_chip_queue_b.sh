#!/bin/bash
# Round-4 wave B: serving-layer re-measurement. Chains behind the wave-A
# runner (pass its pid) so TPU jobs stay strictly serial.
# Usage: bash benchmarks/r4_chip_queue_b.sh [logdir] [wait_pid]
set -u
LOG=${1:-/root/repo/benchmarks/r4logs}
WAIT=${2:-}
mkdir -p "$LOG"
export PYTHONPATH=/root/.axon_site:/root/repo

if [ -n "$WAIT" ]; then
  echo "$(date +%H:%M:%S) waiting for pid $WAIT (wave-A chain)" >&2
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
  local tries=0
  until probe; do
    tries=$((tries + 1))
    if [ "$tries" -ge 10 ]; then
      echo "$(date +%H:%M:%S) device still down after ~30min; skipping" >&2
      return 1
    fi
    echo "$(date +%H:%M:%S) device down; retry in 180s" >&2
    sleep 180
  done
  return 0
}

run() {
  name=$1; shift; to=$1; shift
  if [ -e "$LOG/$name.log" ] && grep -q '"' "$LOG/$name.log"; then
    echo "$(date +%H:%M:%S) SKIP $name (log already has rows)" >&2
    return
  fi
  wait_device || return
  echo "$(date +%H:%M:%S) START $name" >&2
  timeout "$to" "$@" > "$LOG/$name.log" 2> "$LOG/$name.err"
  echo "$(date +%H:%M:%S) DONE $name rc=$?" >&2
  sleep 15
}

cd /root/repo

# 1. B=1 latency with the tunnel RTT isolated (VERDICT item 6): the
#    data-dependent scan chain gives the honest on-device number to put
#    against hnswlib's 0.110 ms p50
run b1_latency 2700 python benchmarks/b1_latency.py

# 2. serving-layer re-run at 1M x 768: admission control (503s counted),
#    quantized singles through the batcher, recall column, server-side
#    took for the int8-vs-exact batched gap (VERDICT items 4/5/10)
run serving_r4 7200 python benchmarks/server_load.py

echo "$(date +%H:%M:%S) R4 QUEUE-B COMPLETE" >&2

# 3. int8 MXU lab rerun: the first attempt shipped the 768 MB codes
#    array inside the HLO (closure capture) and died on the relay's
#    request limit (HTTP 413); the corpus is an explicit jit arg now
run int8_mxu 3600 python benchmarks/int8_mxu_lab.py

# 4. IVF-PQ deep-rerank sweep (grouped kernel only): rr16 topped out at
#    recall 0.72; the grouped kernel is fast enough that rr64-256 may
#    finally put IVF-PQ over the 0.95 serving bar at real QPS
run ivfpq_deep 3600 env PQG_NP=8 PQG_RR=64,128,256 PQG_SKIP_PQ=1 \
    python benchmarks/ivfpq_grouped_tpu.py

# 5. b1_latency 1M x 768 rerun: the first attempt closed over the 1.5 GB
#    bf16 corpus (HTTP 413 class, ROADMAP #34); arrays are jit args now
run b1_latency_1m 2700 env  python benchmarks/b1_latency.py \
    --configs 1000000x768
