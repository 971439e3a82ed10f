#!/bin/bash
# One-window kernel A/B: validate the round-3 opt-in kernels (fused Pallas
# LSTM, int8 one-hot voxelizer matmuls) on CPU, then measure them on the
# real chip.  Designed to run in a pipeline pause (one JAX process at a
# time — CLAUDE.md); each step is sequential, never concurrent.
#
#   bash tools/bench_ab.sh > /tmp/bench_ab.log 2>&1
set -u
cd "$(dirname "$0")/.."

echo "=== $(date -u +%H:%M:%S) CPU parity tests (new kernels, interpret mode)"
python -m pytest tests/test_lstm_pallas.py tests/test_fused_voxelizer.py -q
rc=$?
echo "=== pytest rc=$rc"
if [ $rc -ne 0 ]; then
  echo "=== CPU tests failed; skipping on-chip measurement"
  exit 1
fi
sleep 20

echo "=== $(date -u +%H:%M:%S) on-chip bench: int8 + fused LSTM (full breakdown)"
BENCH_BREAKDOWN=1 BENCH_INT8=1 BENCH_FUSED_LSTM=1 python bench.py
echo "=== rc=$?"
sleep 20

echo "=== $(date -u +%H:%M:%S) on-chip bench: defaults (current graded config)"
BENCH_BREAKDOWN=0 python bench.py
echo "=== rc=$?"

echo "=== bench_ab complete"
