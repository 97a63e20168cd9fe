#!/bin/bash
# Second round-4 chip queue: waits for the first queue (PID $1), then
# re-runs the HBM estimator probe (now with runtime peaks + the decisive
# 524k point) and the stage-1 breakdown (post compile-hygiene fix).
cd "$(dirname "$0")/.."
set -u
while [ -d "/proc/$1" ]; do sleep 120; done
echo "=== queue r4b start $(date -u +%H:%M:%S)"
python tools/probe_hbm_estimator.py > tools/probe_hbm_estimator2.log 2>&1
echo "=== hbm_estimator done rc=$? $(date -u +%H:%M:%S)"
python tools/probe_stage1_breakdown.py > tools/probe_stage1_breakdown2.log 2>&1
echo "=== stage1_breakdown done rc=$? $(date -u +%H:%M:%S)"
python tools/bench_serve.py > tools/bench_serve_tpu.log 2>&1
echo "=== serve_lib done rc=$? $(date -u +%H:%M:%S)"
