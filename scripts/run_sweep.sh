#!/bin/bash
# Elastic sweep driver: runs bench_sweep.py and restarts on exit code 3
# (remote-TPU worker crash — the sweep checkpoints its work queue and
# resumes; see bench_sweep.py docstring). Any other exit code ends the
# loop. First attempt starts fresh unless SWEEP_RESUME=1 is already set.
#
# Usage: SWEEP_N=4096 SWEEP_STEPS=96 JAX_PLATFORMS=cpu,axon \
#        bash scripts/run_sweep.sh [max_attempts]
set -u
MAX_ATTEMPTS=${1:-12}
attempt=1
while true; do
  echo "[run_sweep] attempt $attempt (resume=${SWEEP_RESUME:-0})" >&2
  python "$(dirname "$0")/../bench_sweep.py"
  rc=$?
  if [ "$rc" -ne 3 ]; then
    echo "[run_sweep] finished with rc=$rc after $attempt attempt(s)" >&2
    exit $rc
  fi
  attempt=$((attempt + 1))
  if [ "$attempt" -gt "$MAX_ATTEMPTS" ]; then
    echo "[run_sweep] giving up after $MAX_ATTEMPTS attempts" >&2
    exit 1
  fi
  export SWEEP_RESUME=1
done
