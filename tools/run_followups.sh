#!/bin/bash
# Post-pipeline verification chain (run AFTER tools/run_policy_pipeline.sh
# completes; one JAX process at a time on this machine — CLAUDE.md):
#   1. closed-loop torch-vs-TPU command parity on the trained checkpoint
#      (VERDICT #6 substitute)
#   2. TPU benchmark (bench.py, exercises the fused voxelize+percentile path)
#   3. full CPU test suite
#   4. multi-chip dryrun (virtual 8-device CPU mesh)
#
#   nohup bash tools/run_followups.sh > /tmp/followups.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=/data/evfly
LOG=/tmp/followups
mkdir -p "$LOG"

pick() { grep -o -- '-> .*\.pth' "$1" | tail -1 | cut -c4-; }

run() {
  local name=$1; shift
  echo "=== $(date -u +%H:%M:%S) $name: $*"
  "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) $name rc=$rc"
  tail -4 "$LOG/$name.log"
  sleep 20
  return $rc
}

# newest trained checkpoint: prefer joint_dagger, else joint
CKPT=$(pick "$OUT/pipeline_logs/joint_dagger.log" 2>/dev/null)
[ -z "$CKPT" ] && CKPT=$(pick "$OUT/pipeline_logs/joint.log" 2>/dev/null)
if [ -n "$CKPT" ] && [ -f "$CKPT" ]; then
  run parity_closed_loop python tools/torch_parity_closed_loop.py \
    --ckpt "$CKPT" --frames 120
  # the tool prints its report as the last JSON line; keep it durable
  grep -o '{.*}' "$LOG/parity_closed_loop.log" | tail -1 \
    > /root/repo/artifacts/parity_closed_loop.json
  # HIL with the REAL trained model + renderer-backed event sensor
  # (VERDICT r2 #5); json lands in the durable repo artifacts dir
  run hil_real python tools/hil_real_model.py --ckpt "$CKPT" \
    --out-json /root/repo/artifacts/hil_real.json
else
  echo "=== no trained checkpoint found; skipping parity_closed_loop"
fi

run bench python bench.py

# chunk-DP training quality vs sequential on real pipeline data
# (VERDICT r2 #6; CPU-only, virtual 8-device mesh)
run dp_quality python tools/dp_quality.py \
  --out-json /root/repo/artifacts/dp_quality.json

run pytest python -m pytest tests/ -x -q

run dryrun env JAX_PLATFORMS=cpu python -c \
  "import __graft_entry__ as g; g.dryrun_multichip(8)"

echo "=== followups complete"
