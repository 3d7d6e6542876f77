#!/bin/bash
# Round-4 wave C: out-of-core steady state at 16M x 768 (verdict item 7),
# trimmed to fit the remaining round budget (2 scans; exact + int8).
# Chains behind the wave-B runner. Usage:
#   bash benchmarks/r4_chip_queue_c.sh [logdir] [wait_pid]
set -u
LOG=${1:-/root/repo/benchmarks/r4logs}
WAIT=${2:-}
mkdir -p "$LOG"
export PYTHONPATH=/root/.axon_site:/root/repo

if [ -n "$WAIT" ]; then
  echo "$(date +%H:%M:%S) waiting for pid $WAIT (wave-B chain)" >&2
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

# exact stream: 45.8 GB corpus, 2 steady-state scans (QPS + flat RSS)
run ooc16m 7200 python benchmarks/outofcore_20m.py --rows 16000000 \
    --memmap /tmp/ooc_corpus.f32 --scans 2
# int8 codec over the same corpus: 4x fewer streamed bytes, recall cost
run ooc16m_int8 7200 python benchmarks/outofcore_20m.py --rows 16000000 \
    --memmap /tmp/ooc_corpus.f32 --scans 2 --codec int8 --rerank 16 \
    --recall-vs-exact
rm -f /tmp/ooc_corpus.f32 /tmp/ooc_corpus.f32.*.npy /tmp/ooc_corpus.f32.*.npz

echo "$(date +%H:%M:%S) R4 QUEUE-C COMPLETE" >&2
