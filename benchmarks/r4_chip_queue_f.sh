#!/bin/bash
# Round-4 wave F: finish the 16M int8 out-of-core steady state that wave E's
# deadline cut mid-encode.  Wave E preserved the corpus + partial codes via
# hardlinks (/tmp/ooc_keep.f32[.int8.npy]); this wave
#   1. watches for the stats sidecar in case wave E's run does finish its
#      encode before dying (grabs it via hardlink before queue-E's rm),
#   2. waits for the wave-E job to exit,
#   3. salvages the codes file (benchmarks/ooc_salvage_codes.py — resume
#      encode from the sparse frontier + deterministic quantizer retrain),
#   4. reruns outofcore_20m.py against the preserved names, which now
#      reuses the codes and goes straight to planted-check + timed scans
#      + recall-vs-exact.
# Usage: bash benchmarks/r4_chip_queue_f.sh [logdir] [deadline_epoch] [waitpid]
set -u
LOG=${1:-/root/repo/benchmarks/r4logs}
DEADLINE=${2:-$(($(date +%s) + 5100))}   # default: 85 min from launch
WAITPID=${3:-}
mkdir -p "$LOG"
export PYTHONPATH=/root/.axon_site:/root/repo

remaining() { echo $(( DEADLINE - $(date +%s) )); }

run() {
  name=$1; shift; cap=$1; shift
  left=$(remaining)
  to=$(( left < cap ? left : cap ))
  if [ "$to" -lt 300 ]; then
    echo "{\"skipped\": \"wave-F deadline: ${left}s left < 300s floor\"}" \
      > "$LOG/$name.log"
    echo "$(date +%H:%M:%S) SKIP $name (deadline)" >&2
    return
  fi
  echo "$(date +%H:%M:%S) START $name (timeout ${to}s)" >&2
  timeout "$to" "$@" > "$LOG/$name.log" 2> "$LOG/$name.err"
  echo "$(date +%H:%M:%S) DONE $name rc=$?" >&2
  sleep 5
}

cd /root/repo

# 1. stats-sidecar watcher: hardlink it under the keep name the moment the
#    wave-E run writes it (queue E rm's the original seconds later)
(
  for _ in $(seq 1 600); do
    if [ -f /tmp/ooc_corpus.f32.int8.npy.stats.npz ]; then
      ln -f /tmp/ooc_corpus.f32.int8.npy.stats.npz \
            /tmp/ooc_keep.f32.int8.npy.stats.npz && \
        echo "$(date +%H:%M:%S) grabbed stats sidecar" >&2
      break
    fi
    sleep 2
  done
) &
WATCHER=$!

# 2. wait for the wave-E job (and its queue's cleanup) to finish
if [ -n "$WAITPID" ]; then
  while kill -0 "$WAITPID" 2>/dev/null; do
    if [ "$(remaining)" -lt 600 ]; then
      echo "$(date +%H:%M:%S) wave-E still alive with <600s left; abort" >&2
      exit 1
    fi
    sleep 15
  done
  sleep 20   # let queue E's rm + COMPLETE line land
fi
kill "$WATCHER" 2>/dev/null

# 3. complete the codes file + stats sidecar (no-op if wave E finished them)
run ooc16m_salvage 2400 python benchmarks/ooc_salvage_codes.py \
    --corpus /tmp/ooc_keep.f32 --rows 16000000 --dims 768 \
    --tile 1048576 --codec int8

# 4. the steady-state run wave E was after: codes reused, so this goes
#    straight to planted-check + 2 timed scans + recall vs one exact pass
run ooc16m_int8_r2 3600 python benchmarks/outofcore_20m.py \
    --rows 16000000 --memmap /tmp/ooc_keep.f32 --scans 2 --codec int8 \
    --rerank 16 --recall-vs-exact

rm -f /tmp/ooc_keep.f32 /tmp/ooc_keep.f32.*.npy /tmp/ooc_keep.f32.*.npz \
      /tmp/ooc_corpus.f32 /tmp/ooc_corpus.f32.*.npy /tmp/ooc_corpus.f32.*.npz
echo "$(date +%H:%M:%S) R4 QUEUE-F COMPLETE" >&2
