#!/bin/bash
# Bounded background probe: exits 0 the moment the axon TPU backend answers,
# exits 1 after N failed probes. Single-tenant tunnel: each probe is one
# short-lived client killed by timeout, spaced widely enough not to wedge it.
N=${1:-14}          # probes
SLEEP=${2:-1500}    # seconds between probes (~25 min)
LOG=/tmp/tpu_probe.log
for i in $(seq 1 "$N"); do
  echo "$(date -u +%H:%M:%S) probe $i/$N" >> "$LOG"
  if timeout 90 python -c "
import jax, jax.numpy as jnp
jax.devices()
assert float(jnp.ones((8,128)).sum()) == 1024.0
print('TPU OK')
" >> "$LOG" 2>&1; then
    echo "$(date -u +%H:%M:%S) TPU BACK" >> "$LOG"
    exit 0
  fi
  sleep "$SLEEP"
done
echo "$(date -u +%H:%M:%S) giving up" >> "$LOG"
exit 1
