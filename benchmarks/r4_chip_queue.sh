#!/bin/bash
# Round-4 serial TPU queue — the measurement-and-honesty campaign.
#
# Priorities (VERDICT r3 "Next round" items):
#   1. bench.py headline -> a parseable BENCH_r04 candidate (item 1/2)
#   2. 4M grouped rerank sweep -> substantiate or retract the README
#      "88k @ 4M gated >=0.95" row (item 1, weak #1)
#   3. int8 MXU-rate lab -> the one open perf lever (item 3)
#   4. 1M grouped sweep, grouped IVF-PQ, int4 -> README table evidence
#   5. api_overhead re-run (r3 queue-2 carryover)
#
# Logs land in benchmarks/r4logs/ (committable).  Jobs run strictly
# serially — concurrent TPU processes crash the remote-compile relay.
# Usage: bash benchmarks/r4_chip_queue.sh [logdir]
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
  # bounded: after 30 min of a dead tunnel, move on so later jobs get
  # their shot if it recovers (the r3 infinite waiters all died)
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

# 1. headline bench (BENCH_r04 candidate; validates every candidate mode)
run bench 2700 python bench.py

# 2. 4M grouped rerank sweep: recall >= 0.95 evidence (or retraction) for
#    the README 88k row; exact 4M baseline re-measured in the same run so
#    the ratio is same-artifact (the r3 claim paired numbers from
#    different runs)
run ivfg4m_rr 4500 env IVFG_N=4000000 python benchmarks/ivf_grouped_5m.py \
    --nlist 4096 --np 8,16

# 3. int8 MXU-rate lab (ROADMAP #31): can pallas reach the v5e 2x s8 rate?
run int8_mxu 2400 python benchmarks/int8_mxu_lab.py

# 4. 1M grouped sweep incl. exact baseline
run ivfg1m_rr 2700 env IVFG_N=1000000 python benchmarks/ivf_grouped_5m.py \
    --nlist 2048 --np 8,16

# 5. grouped (cell-major) IVF-PQ vs per-query kernel at 1M (ROADMAP #30)
run ivfpq_grouped 3600 python benchmarks/ivfpq_grouped_tpu.py

# 6. int4 two-stage at 1M (README row says "chip run queued")
run int4_1m 2700 python benchmarks/int4_tpu.py

# 7. api_overhead bf16 re-run (assembly-cost halving landed after r3 rows)
run api_overhead 2400 python benchmarks/api_overhead.py --bf16

echo "$(date +%H:%M:%S) R4 QUEUE COMPLETE" >&2
