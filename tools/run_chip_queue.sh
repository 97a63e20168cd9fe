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

run_job stage1_breakdown python tools/probe_stage1_breakdown.py
run_job ktgnn_scale_bf16msg env BGNN_KTGNN_KERNEL=1 BGNN_MSG_BF16=1 \
  python tools/bench_ktgnn_scale.py results_ktgnn_scale_bf16msg.json
run_job pipeline_scale_r3 python tools/bench_pipeline_scale.py
run_job serve_tpu python tools/bench_serve.py
run_job tpu_lane env BGNN_TPU_TESTS=1 python -m pytest tests/ -m tpu -q
run_job bench python bench.py

echo "=== queue done $(date -u +%H:%M:%S)"
