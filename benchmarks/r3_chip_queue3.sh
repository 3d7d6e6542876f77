#!/bin/bash
# Third serial TPU queue: graph ANN wide-expand sweep (ROADMAP #22).
# Usage: bash benchmarks/r3_chip_queue3.sh [logdir]
set -u
LOG=${1:-/tmp/r3q3}
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

echo "$(date +%H:%M:%S) START graph_sweep" >&2
cd /root/repo/benchmarks
timeout 5400 python graph_sweep.py > "$LOG/graph_sweep.log" 2>&1
echo "$(date +%H:%M:%S) DONE graph_sweep rc=$?" >&2
echo "$(date +%H:%M:%S) QUEUE3 COMPLETE" >&2
