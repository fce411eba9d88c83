#!/bin/bash
# Pre-snapshot TPU smoke (VERDICT r2 item 1): run before every round
# snapshot so a Mosaic-only break can never ship silently again.
#
#   1. Mosaic LOWERING smoke: every pallas_call family lowered with
#      interpret=False on the real backend (seconds-fast; this is where
#      BlockSpec violations surface — the BENCH_r02 failure mode).
#   2. Custom-call EXECUTION probe + full bench: bench.py exits 0 and
#      prints the JSON line; its built-in subprocess watchdog falls back
#      to the XLA path (CAM_FORCE_XLA=1) if the tunnel's custom-call
#      execution is wedged (the round-3 failure mode).
set -uo pipefail
cd "$(dirname "$0")/.."

echo "== 1/2 Mosaic lowering smoke =="
CAM_TPU_TESTS=1 timeout 600 python -m pytest tests/test_tpu_lowering.py -q -o addopts="" || {
  echo "TPU LOWERING SMOKE FAILED"; exit 1; }

echo "== 2/2 bench =="
timeout 1500 python bench.py || { echo "BENCH FAILED rc=$?"; exit 1; }
echo "TPU SMOKE PASS"
