#!/bin/bash
# Second serial TPU queue: long-running measurements (run after
# r3_chip_queue.sh finishes).  Usage: bash benchmarks/r3_chip_queue2.sh [logdir]
set -u
LOG=${1:-/tmp/r3q2}
mkdir -p "$LOG"
export PYTHONPATH=/root/.axon_site:/root/repo

probe() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax
import numpy as np
x = jax.numpy.ones((8, 8))
np.asarray(jax.device_get(x.sum()))
EOF
}

until probe; do
  echo "$(date +%H:%M:%S) device down; retry in 180s" >&2
  sleep 180
done

run() {
  name=$1; shift; to=$1; shift
  echo "$(date +%H:%M:%S) START $name" >&2
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  echo "$(date +%H:%M:%S) DONE $name rc=$?" >&2
  sleep 20
}

# API-overhead re-run (assembly-cost halving + fetch-barrier landed after
# the recorded bf16 rows)
run api_overhead 3600 python benchmarks/api_overhead.py --bf16
# out-of-core steady state: 16M x 768 f32 (45.8 GB, 2.9x HBM) memmap-backed,
# warm QPS + flat RSS over >=3 scans (VERDICT r2 item 7 / ROADMAP #20)
run ooc16m 14400 python benchmarks/outofcore_20m.py --rows 16000000 \
    --memmap /tmp/ooc_corpus.f32 --scans 4
# quantized streamed tiers over the SAME 16M corpus (codes memmapped to
# disk): int8 moves 2x fewer wire bytes than the bf16 exact stream,
# binary 16x fewer — the transfer-bound regime's codec ratio IS the QPS
# ratio; --recall-vs-exact records the quality cost
run ooc16m_int8 10800 python benchmarks/outofcore_20m.py --rows 16000000 \
    --memmap /tmp/ooc_corpus.f32 --scans 3 --codec int8 --rerank 16 \
    --recall-vs-exact
# drop each codec's code files before the next job: corpus (45.8 GB) +
# int8 codes (12.3 GB) already graze the 60 GB free on this box
rm -f /tmp/ooc_corpus.f32.int8.npy /tmp/ooc_corpus.f32.int8.npz
run ooc16m_binary 10800 python benchmarks/outofcore_20m.py --rows 16000000 \
    --memmap /tmp/ooc_corpus.f32 --scans 3 --codec binary --rerank 96 \
    --recall-vs-exact
rm -f /tmp/ooc_corpus.f32.binary.npy /tmp/ooc_corpus.f32.binary.npz
run ooc16m_pq 10800 python benchmarks/outofcore_20m.py --rows 16000000 \
    --memmap /tmp/ooc_corpus.f32 --scans 3 --codec pq --rerank 16 \
    --recall-vs-exact
rm -f /tmp/ooc_corpus.f32 /tmp/ooc_corpus.f32.*.npy /tmp/ooc_corpus.f32.*.npz
echo "$(date +%H:%M:%S) QUEUE2 COMPLETE" >&2
