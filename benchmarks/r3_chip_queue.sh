#!/bin/bash
# Serial TPU job queue for the round-3 measurement campaign.
# Waits for the tunnel to answer, then runs each job with its own log.
# Usage: bash benchmarks/r3_chip_queue.sh [logdir]
set -u
LOG=${1:-/tmp/r3q}
mkdir -p "$LOG"
export PYTHONPATH=/root/.axon_site:/root/repo

probe() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax
x = jax.numpy.ones((8, 8))
import numpy as np, jax as j
np.asarray(j.device_get(x.sum()))
EOF
}

echo "waiting for device..." >&2
until probe; do
  echo "$(date +%H:%M:%S) device still down; retry in 180s" >&2
  sleep 180
done
echo "$(date +%H:%M:%S) device up" >&2

run() {
  name=$1; shift
  echo "$(date +%H:%M:%S) START $name" >&2
  timeout 5400 "$@" > "$LOG/$name.log" 2>&1
  echo "$(date +%H:%M:%S) DONE $name rc=$?" >&2
  sleep 20
}

# 1. 4M grouped-IVF rerank sweep (recall >=0.95 check for the 3.1x row)
run ivfg4m_rr env IVFG_N=4000000 python benchmarks/ivf_grouped_5m.py \
    --nlist 4096 --np 8,16 --skip-exact
# 2. 1M grouped sweep incl. exact baseline (headline-candidate evidence)
run ivfg1m_rr env IVFG_N=1000000 python benchmarks/ivf_grouped_5m.py \
    --nlist 2048 --np 8,16
# 3. headline bench with the new candidate
run bench python bench.py
# 4. 5M grouped sweep incl. exact baseline (the HBM-bound regime)
run ivfg5m_rr env IVFG_N=5000000 python benchmarks/ivf_grouped_5m.py \
    --nlist 4096 --np 4,8 --factor 1.25
echo "$(date +%H:%M:%S) QUEUE COMPLETE" >&2
