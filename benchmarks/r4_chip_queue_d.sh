#!/bin/bash
# Round-4 wave D: priority-reordered tail of the campaign.
#   1. serving_r4 QUIET rerun — the first run shared its one core with a
#      concurrent pytest suite (builder error); exact-batched rows were
#      depressed ~10x. Nothing else may run on the host during this job.
#   2. int8 MXU lab (fixed: corpus as jit arg)   3. IVF-PQ deep rerank
#   4. b1_latency at 1M x 768
# Usage: bash benchmarks/r4_chip_queue_d.sh [logdir]
set -u
LOG=${1:-/root/repo/benchmarks/r4logs}
mkdir -p "$LOG"
export PYTHONPATH=/root/.axon_site:/root/repo

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

run serving_r4 2700 python benchmarks/server_load.py
run int8_mxu 2700 python benchmarks/int8_mxu_lab.py
run ivfpq_deep 2700 env PQG_NP=8 PQG_RR=64,128,256 PQG_SKIP_PQ=1 \
    python benchmarks/ivfpq_grouped_tpu.py
run b1_latency_1m 2400 python benchmarks/b1_latency.py --configs 1000000x768
echo "$(date +%H:%M:%S) R4 QUEUE-D COMPLETE" >&2
