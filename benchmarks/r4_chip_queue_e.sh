#!/bin/bash
# Round-4 wave E: the twice-deferred 16M x 768 out-of-core steady state
# (verdict item 7 / ROADMAP #35), sized to FIT the session this time:
#   * host-side quantizer encoding landed (core/outofcore.py:_host_encode_tile)
#     — the int8 build no longer ships 45.8 GB of f32 through the tunnel;
#   * every job runs under an ABSOLUTE wall deadline so nothing can linger
#     into the driver's end-of-round bench (the r3 rc=124 failure class).
# Usage: bash benchmarks/r4_chip_queue_e.sh [logdir] [deadline_epoch]
set -u
LOG=${1:-/root/repo/benchmarks/r4logs}
DEADLINE=${2:-$(($(date +%s) + 5700))}   # default: 95 min from launch
mkdir -p "$LOG"
export PYTHONPATH=/root/.axon_site:/root/repo

remaining() { echo $(( DEADLINE - $(date +%s) )); }

run() {
  name=$1; shift; cap=$1; shift
  left=$(remaining)
  to=$(( left < cap ? left : cap ))
  if [ "$to" -lt 600 ]; then
    echo "{\"skipped\": \"wave-E deadline: ${left}s left < 600s floor\"}" \
      > "$LOG/$name.log"
    echo "$(date +%H:%M:%S) SKIP $name (deadline)" >&2
    return
  fi
  echo "$(date +%H:%M:%S) START $name (timeout ${to}s)" >&2
  timeout "$to" "$@" > "$LOG/$name.log" 2> "$LOG/$name.err"
  echo "$(date +%H:%M:%S) DONE $name rc=$?" >&2
  sleep 10
}

cd /root/repo

# exact stream: 45.8 GB f32 corpus (2.9x HBM), bf16 wire, 2 scans
# (scan0 warmup, scan1 timed) — sustained QPS + flat-RSS evidence
run ooc16m 3300 python benchmarks/outofcore_20m.py --rows 16000000 \
    --memmap /tmp/ooc_corpus.f32 --scans 2

# int8 codec over the same corpus: host-encoded codes (no f32 upload),
# 4x fewer streamed bytes, recall vs one exact streamed pass
run ooc16m_int8 3300 python benchmarks/outofcore_20m.py --rows 16000000 \
    --memmap /tmp/ooc_corpus.f32 --scans 2 --codec int8 --rerank 16 \
    --recall-vs-exact

# preserve the expensive artifacts under the keep names BEFORE cleanup so
# queue F's salvage/reuse path (ooc_keep.f32*) works from the checked-in
# scripts alone (r4 advisor: the hardlinks were previously created by a
# manual step / queue F's watcher racing this rm)
ln -f /tmp/ooc_corpus.f32 /tmp/ooc_keep.f32 2>/dev/null || true
for f in /tmp/ooc_corpus.f32.*.npy /tmp/ooc_corpus.f32.*.npz; do
  [ -f "$f" ] && ln -f "$f" "/tmp/ooc_keep.f32${f#/tmp/ooc_corpus.f32}" \
    2>/dev/null
done
rm -f /tmp/ooc_corpus.f32 /tmp/ooc_corpus.f32.*.npy /tmp/ooc_corpus.f32.*.npz
echo "$(date +%H:%M:%S) R4 QUEUE-E COMPLETE" >&2
