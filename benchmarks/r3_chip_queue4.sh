#!/bin/bash
# Fourth serial TPU queue: int4 two-stage vs int8/exact (new codec).
# Usage: bash benchmarks/r3_chip_queue4.sh [logdir]
set -u
LOG=${1:-/tmp/r3q4}
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

until probe; do
  echo "$(date +%H:%M:%S) device down; retry in 180s" >&2
  sleep 180
done

run() {
  name=$1; shift
  echo "$(date +%H:%M:%S) START $name" >&2
  timeout 5400 "$@" > "$LOG/$name.log" 2>&1
  echo "$(date +%H:%M:%S) DONE $name rc=$?" >&2
  sleep 20
}

cd /root/repo
# 1. 1M: does halving int8's coarse bytes show at B=64 (HBM-bound)?
run int4_1m python benchmarks/int4_tpu.py
# 2. 5M: the regime where bandwidth dominates; int8 dropped for HBM room
run int4_5m env Q4_N=5000000 Q4_SKIP_INT8=1 Q4_B=64,1024 \
    python benchmarks/int4_tpu.py
echo "$(date +%H:%M:%S) QUEUE4 COMPLETE" >&2
