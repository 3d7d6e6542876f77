#!/bin/bash
# Round-5 serial TPU queue runner with a HARD round-end guard.
#
# Round-4 postmortem (VERDICT r4, Missing #1): a 57-minute chip job was
# started late enough to straddle the round boundary and starved the
# driver's final bench.py run into rc=124 — the SECOND consecutive
# driver-artifact loss, and one the builder had predicted in prose
# (ROADMAP #35).  A prose rule doesn't hold; this runner enforces it:
#
#   * every job declares a TIMEOUT_S budget;
#   * a job REFUSES to start if now + TIMEOUT_S + SLACK crosses
#     GUARD_EPOCH (default: set by the caller to ~90 min before round
#     end) — it is skipped, loudly, and the queue moves on;
#   * jobs run strictly serially (concurrent TPU processes crash the
#     remote-compile relay — ROADMAP #26).
#
# Usage:
#   GUARD_EPOCH=<unix ts> bash benchmarks/r5_queue_runner.sh jobs.txt [logdir]
# where jobs.txt lines are:  <timeout_s> <logname> <command...>
# Lines starting with # are skipped.
set -u
JOBS=${1:?usage: GUARD_EPOCH=<ts> r5_queue_runner.sh jobs.txt [logdir]}
LOG=${2:-/root/repo/benchmarks/r5logs}
GUARD_EPOCH=${GUARD_EPOCH:?set GUARD_EPOCH to the no-new-chip-work unix time}
SLACK=${SLACK:-120}
mkdir -p "$LOG"
# ALWAYS put the repo on the path: the login profile pre-sets PYTHONPATH
# (axon site dir only), so a ${PYTHONPATH:-...} default silently keeps a
# value that cannot import the package (r5 wave-A b1_ivf failure)
export PYTHONPATH=/root/repo:${PYTHONPATH:-/root/.axon_site}

probe() {
  timeout 180 env JAX_COMPILATION_CACHE_DIR=/tmp/jax_bench_cache \
    python - <<'PYEOF' >/dev/null 2>&1
import jax
import numpy as np
x = jax.numpy.ones((8, 8))
np.asarray(jax.device_get(x.sum()))
PYEOF
}

wait_device() {
  # bounded: after ~20 min of a dead tunnel, move on so later jobs get
  # their shot if it recovers (the r3 infinite waiters all died)
  local tries=0
  until probe; do
    tries=$((tries + 1))
    if [ "$tries" -ge 8 ]; then
      echo "$(date +%H:%M:%S) device still down after ~20min; skipping" >&2
      return 1
    fi
    echo "$(date +%H:%M:%S) device down; retry in 150s" >&2
    sleep 150
  done
  return 0
}

while IFS= read -r line; do
  case "$line" in ''|'#'*) continue ;; esac
  TIMEOUT_S=$(echo "$line" | awk '{print $1}')
  NAME=$(echo "$line" | awk '{print $2}')
  CMD=$(echo "$line" | cut -d' ' -f3-)
  NOW=$(date +%s)
  END=$((NOW + TIMEOUT_S + SLACK))
  if [ "$END" -ge "$GUARD_EPOCH" ]; then
    echo "$(date +%H:%M:%S) GUARD: skipping '$NAME' — its ${TIMEOUT_S}s budget" \
         "would cross the no-chip-work guard ($(date -d @"$GUARD_EPOCH" +%H:%M:%S))" \
      | tee -a "$LOG/runner.log" >&2
    continue
  fi
  if ! wait_device; then
    echo "$(date +%H:%M:%S) SKIP (device down): $NAME" \
      | tee -a "$LOG/runner.log" >&2
    continue
  fi
  echo "$(date +%H:%M:%S) START $NAME (timeout ${TIMEOUT_S}s): $CMD" \
    | tee -a "$LOG/runner.log" >&2
  timeout "$TIMEOUT_S" bash -c "$CMD" > "$LOG/$NAME.log" 2>&1
  RC=$?
  echo "$(date +%H:%M:%S) DONE  $NAME rc=$RC" | tee -a "$LOG/runner.log" >&2
  # cool-down between chip processes: attaching a new client while the
  # previous one tears down can crash the remote-compile relay (the r4
  # runner slept 10 s; the r5 wave-B probe at 04:57 hit exactly this)
  sleep 30
done < "$JOBS"
echo "$(date +%H:%M:%S) queue complete" | tee -a "$LOG/runner.log" >&2
