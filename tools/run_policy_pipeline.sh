#!/bin/bash
# Round-2 policy-quality pipeline (VERDICT round-2 item #2): the reference's
# own recipe — separate D(theta)/V(phi) pretraining merged via
# combine_state_dicts (ref learner.py:435-454), joint fine-tune, protocol
# eval, then a DAgger round (Ross et al. 2011) against the privileged
# expert.  Phases run serially in ONE process chain (one JAX process at a
# time on this machine — CLAUDE.md).
#
#   nohup bash tools/run_policy_pipeline.sh > /tmp/pipeline.log 2>&1 &
#
# Assumes simgen_forest_big.h5 already generated (tools/datagen.py).
set -u
cd "$(dirname "$0")/.."
OUT=/data/evfly
LOG=$OUT/pipeline_logs
mkdir -p "$LOG"

pick() { # final checkpoint path printed by train_policy._train
  grep -o -- '-> .*\.pth' "$1" | tail -1 | cut -c4-
}

run() { # run <name> <cmd...>: log to $LOG/<name>.log, echo rc + tail
  local name=$1; shift
  echo "=== $(date -u +%H:%M:%S) $name: $*"
  "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) $name rc=$rc"
  tail -4 "$LOG/$name.log"
  sleep 20   # let the axon tunnel settle between JAX processes
  return $rc
}

if [ ! -f "$OUT/data/datasets/simgen_forest_big.h5" ]; then
  run datagen_big python tools/datagen.py --out "$OUT" --trials 160 \
    --batch 20 --mode state --name simgen_forest_big --seed 100 || exit 1
fi

if [ ! -f "$OUT/data/datasets/simgen_forest_planner.h5" ]; then
  # batch 20 matches the datagen_big program shape: the lockstep-rollout
  # XLA programs are shape-keyed on G, so G=20 reuses the compiled binary
  # (server-side compiles cost 10-25 min each on a cold cache)
  run datagen_planner python tools/datagen.py --out "$OUT" --trials 40 \
    --batch 20 --mode planner --name simgen_forest_planner --seed 200 || exit 1
fi

# phases are idempotent: a phase whose log already ends in a checkpoint
# pick is skipped on re-runs (crash/OOM recovery re-enters mid-pipeline)
if [ -z "$(pick "$LOG/pretrain_v.log" 2>/dev/null)" ]; then
  run pretrain_v python tools/train_policy.py pretrain_v --epochs 8 || exit 1
fi
V_CKPT=$(pick "$LOG/pretrain_v.log")
if [ -z "$(pick "$LOG/pretrain_d.log" 2>/dev/null)" ]; then
  run pretrain_d python tools/train_policy.py pretrain_d --epochs 8 || exit 1
fi
D_CKPT=$(pick "$LOG/pretrain_d.log")
echo "V=$V_CKPT D=$D_CKPT"

if [ -z "$(pick "$LOG/joint.log" 2>/dev/null)" ]; then
  run joint python tools/train_policy.py joint --epochs 16 \
    --d-ckpt "$D_CKPT" --v-ckpt "$V_CKPT" || exit 1
fi
J_CKPT=$(pick "$LOG/joint.log")
echo "JOINT=$J_CKPT"

run eval_joint python tools/train_policy.py eval --ckpt "$J_CKPT" \
  --trials 20 --batch 20 --out-json "$OUT/eval_joint.json"

run dagger python tools/train_policy.py dagger --ckpt "$J_CKPT" \
  --trials 40 --batch 20 || exit 1

run joint_dagger python tools/train_policy.py joint --epochs 8 \
  --logsub joint_dagger --resume "$J_CKPT" --extra-data dagger_r1 || exit 1
JD_CKPT=$(pick "$LOG/joint_dagger.log")
echo "JOINT_DAGGER=$JD_CKPT"

run eval_dagger python tools/train_policy.py eval --ckpt "$JD_CKPT" \
  --trials 20 --batch 20 --out-json "$OUT/eval_dagger.json"

echo "=== pipeline complete"
