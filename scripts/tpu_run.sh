#!/bin/bash
# Run a python script against the real TPU chip with claim-retry.
#
# The axon tunnel grants the single v5e chip to one process at a time and a
# killed/raced claim can leave the grant stuck for a couple of minutes; a
# fresh process then hangs in jax.devices(). This wrapper probes for the
# claim with a short timeout and retries with backoff before launching the
# real (long) run.
#
# Usage: scripts/tpu_run.sh [--attempts N] <script.py> [args...]

set -u
ATTEMPTS=8
if [ "${1:-}" = "--attempts" ]; then ATTEMPTS=$2; shift 2; fi

for i in $(seq 1 "$ATTEMPTS"); do
    if timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
        exec python "$@"
    fi
    echo "[tpu_run] claim attempt $i/$ATTEMPTS failed; backing off" >&2
    sleep $((30 * i))
done
echo "[tpu_run] could not claim TPU after $ATTEMPTS attempts" >&2
exit 111
