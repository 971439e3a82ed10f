#!/bin/bash
# Second round-3 kernel window: validate the wavefront LSTM kernel and the
# bf16-encoder serving cast on CPU, then measure both on the real chip.
# One JAX process at a time (CLAUDE.md); run inside a pipeline pause.
#
#   bash tools/bench_ab2.sh > /tmp/bench_ab3.log 2>&1
set -u
cd "$(dirname "$0")/.."

echo "=== $(date -u +%H:%M:%S) CPU parity tests (wavefront LSTM, interpret mode)"
python -m pytest tests/test_lstm_pallas.py tests/test_fused_voxelizer.py \
  tests/test_stream.py -q
rc=$?
echo "=== pytest rc=$rc"
if [ $rc -ne 0 ]; then
  echo "=== CPU tests failed; skipping on-chip measurement"
  exit 1
fi
sleep 20

# one run measures everything: the headline on current defaults, then the
# breakdown stages A/B the LSTM variants (stacked/scan/wavefront), the
# encoder alone, and the bf16-encoder model twin (with max|dvel| vs f32)
echo "=== $(date -u +%H:%M:%S) on-chip bench: defaults + full breakdown"
BENCH_BREAKDOWN=1 python bench.py
echo "=== rc=$?"

echo "=== bench_ab2 complete"
