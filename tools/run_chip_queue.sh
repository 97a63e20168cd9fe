#!/bin/bash
# Serial TPU job queue: waits for the tunnel to come back, then runs the
# round's chip measurements one at a time (one TPU client at a time; no
# timeout wrappers — killing in-flight TPU work wedges the terminal).
#
#   nohup bash tools/run_chip_queue.sh > tools/chip_queue.log 2>&1 &
#
# Each job retries up to 3 times; before every attempt the aliveness
# gate re-runs, so a mid-queue tunnel outage parks the queue instead of
# failing the remaining jobs. (Deterministic job failures still burn the
# retries — acceptable for an unattended queue.)

cd "$(dirname "$0")/.."
set -u

wait_alive () {
  until python - << 'PYEOF'
import jax, jax.numpy as jnp
assert jax.devices()[0].platform == "tpu"
(jnp.ones((128,128)) @ jnp.ones((128,128))).block_until_ready()
print("tunnel alive:", jax.devices())
PYEOF
  do
    echo "tunnel down $(date -u +%H:%M:%S); retrying in 300s"
    sleep 300
  done
}

run_job () {
  local name="$1"; shift
  for attempt in 1 2 3; do
    wait_alive
    echo "=== [$name] attempt $attempt $(date -u +%H:%M:%S)"
    if "$@"; then
      echo "=== [$name] OK $(date -u +%H:%M:%S)"
      return 0
    fi
    echo "=== [$name] failed (attempt $attempt); sleeping 300s"
    sleep 300
  done
  echo "=== [$name] GAVE UP"
  return 1
}

# round 4: wait for any already-running standalone chip job first (one
# TPU client at a time; pass its PID via BGNN_WAIT_PID)
if [ -n "${BGNN_WAIT_PID:-}" ]; then
  while [ -d "/proc/${BGNN_WAIT_PID}" ]; do
    echo "waiting for pid ${BGNN_WAIT_PID} $(date -u +%H:%M:%S)"; sleep 60
  done
fi

run_job halo_overlap python tools/bench_halo_overlap.py
run_job hbm_estimator python tools/probe_hbm_estimator.py
run_job serve_http python tools/bench_serve_http.py
run_job pipeline_scale_r4 python tools/bench_pipeline_scale.py
run_job tpu_lane env BGNN_TPU_TESTS=1 python -m pytest tests/ -m tpu -q
run_job bench python bench.py

echo "=== queue done $(date -u +%H:%M:%S)"
