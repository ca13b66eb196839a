#!/bin/bash
# Poll the TPU tunnel; the moment it answers, run the round-4 measurement
# battery (scripts/measure_r4.sh).  Used when the tunnel is down so the
# measurements land unattended as soon as it recovers.
set -u
cd "$(dirname "$0")/.."
mkdir -p .cache/r4_bench
LOG=.cache/r4_bench/wait_and_measure.log
probe() {
  timeout 180 env PYTHONPATH=/root/repo:/root/.axon_site python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 8))
print('probe ok:', jax.devices()[0].platform, float((x @ x).sum()))
" >>"$LOG" 2>&1
}
for i in $(seq 1 60); do
  echo "--- probe $i $(date +%H:%M:%S)" >>"$LOG"
  if probe; then
    echo "--- tunnel UP at $(date +%H:%M:%S); running battery" >>"$LOG"
    bash scripts/measure_r4.sh >>"$LOG" 2>&1
    echo "--- battery done rc=$? at $(date +%H:%M:%S)" >>"$LOG"
    exit 0
  fi
  sleep 600
done
echo "--- gave up after 60 probes" >>"$LOG"
exit 1
