#!/bin/bash
# Probe the axon TPU tunnel on a wide interval; the moment it answers,
# fire the full hardware-validation session (tools/hw_session.sh) and exit
# with its status. Exits 1 if the backend never returns.
#
#   bash tools/tpu_watch.sh [probes] [sleep-s]
#
# Wide spacing on purpose: a timeout-killed probe client can wedge the
# single-tenant tunnel for minutes, so rapid retries make recovery less
# likely (see bench.py wait_for_backend).
set -u
cd "$(dirname "$0")/.."
N=${1:-20}
SLEEP=${2:-1200}
LOG=/tmp/tpu_watch.log
for i in $(seq 1 "$N"); do
  echo "$(date -u +%H:%M:%S) probe $i/$N" >> "$LOG"
  if timeout 90 python -c "
import jax, jax.numpy as jnp
jax.devices()
assert float(jnp.ones((8,128)).sum()) == 1024.0
print('TPU OK')
" >> "$LOG" 2>&1; then
    echo "$(date -u +%H:%M:%S) TPU BACK — starting hw_session" >> "$LOG"
    bash tools/hw_session.sh >> "$LOG" 2>&1
    exit $?
  fi
  sleep "$SLEEP"
done
echo "$(date -u +%H:%M:%S) giving up" >> "$LOG"
exit 1
