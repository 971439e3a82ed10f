#!/bin/bash
# Round-5e — rigid-dynamics DAgger adaptation.
#
# eval_rigid.json showed policy_best (trained only on the first-order
# velocity-tracking quad) at 95% / 0.05 mean crashes under the FULL rigid
# body flight stack.  This chain closes that last gap the DAgger way:
# collect expert relabels on rigid-dynamics policy-visited states, then
# fine-tune and evaluate under BOTH dynamics.  Everything regenerates
# deterministically from committed checkpoints + seeds (the machine was
# wiped again before this chain).
#
# Phases (serial, ONE JAX-on-TPU process at a time — CLAUDE.md):
#   1. base mix regen (seeds 100/300/200 — identical to run_round4e.sh)
#   2. dagger_r3/r4 set regen (from joint_dagger2/3, seeds 70000/80000 —
#      the sets cycles 3/4 trained on, per run_round5.sh)
#   3. dagger_rigid: 24 rigid-dynamics trials of policy_best, expert labels
#   4. joint_rigid: resume policy_best on mix + r3 + r4 + rigid (5 epochs)
#   5. eval under rigid (seed 92000) and first-order held-out (seed 91000)
#
#   PIPE_DEADLINE=<epoch-secs> nohup bash tools/run_round5e.sh > /tmp/round5e.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export EVFLY_OUT=${EVFLY_OUT:-/root/repo/.data/evfly}
export EVFLY_DATASETS=simgen_forest_big,simgen_forest_big2,simgen_forest_planner
OUT=$EVFLY_OUT
LOG=$OUT/pipeline_logs
ART=/root/repo/artifacts
D=$OUT/data/datasets
mkdir -p "$LOG" "$ART" "$D"

DEADLINE=${PIPE_DEADLINE:-$(( $(date +%s) + 200*60 ))}
left() { echo $(( DEADLINE - $(date +%s) )); }

guard() {
  if [ -f /tmp/pipeline_stop ]; then
    echo "=== $(date -u +%H:%M:%S) stop sentinel present, exiting before $1"
    exit 0
  fi
  echo "=== $(date -u +%H:%M:%S) budget left before $1: $(( $(left) / 60 )) min"
  if [ -n "${2:-}" ] && [ "$(left)" -lt "$2" ]; then
    echo "=== $(date -u +%H:%M:%S) budget: skipping $1 (needs ${2}s, $(left)s left)"
    return 1
  fi
  return 0
}

run() {
  local name=$1; shift
  echo "=== $(date -u +%H:%M:%S) $name: $*"
  "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) $name rc=$rc"
  tail -4 "$LOG/$name.log"
  sleep 10
  return $rc
}

keep() {
  [ -e "$1" ] && cp -f "$1" "$ART/${2:-$(basename "$1")}" && echo "kept $1 -> $ART/${2:-$(basename "$1")}"
}

pick() { grep -o -- '-> .*\.pth' "$1" 2>/dev/null | tail -1 | cut -c4-; }

df -h / | tail -1

# ---------------- 1. base mix regen ----------------
if [ ! -f "$D/simgen_forest_big.h5" ]; then
  guard datagen_big 1200 || exit 0
  run datagen_big python tools/datagen.py --out "$OUT" --trials 60 \
    --batch 20 --mode state --name simgen_forest_big --seed 100 || exit 1
fi
if [ ! -f "$D/simgen_forest_big2.h5" ]; then
  guard datagen_big2 1200 || exit 0
  run datagen_big2 python tools/datagen.py --out "$OUT" --trials 80 \
    --batch 20 --mode state --name simgen_forest_big2 --seed 300 || exit 1
fi
if [ ! -f "$D/simgen_forest_planner.h5" ]; then
  guard datagen_planner 1200 || exit 0
  run datagen_planner python tools/datagen.py --out "$OUT" --trials 40 \
    --batch 20 --mode planner --name simgen_forest_planner --seed 200 || exit 1
fi

# ---------------- 2. dagger_r3 / r4 set regen ----------------
if [ ! -f "$D/dagger_r3.h5" ]; then
  guard dagger_r3 900 || exit 0
  run dagger_r3 python tools/train_policy.py dagger \
    --ckpt "$ART/joint_dagger2_final.pth" \
    --trials 24 --batch 24 --seed 70000 --name dagger_r3 || exit 1
fi
if [ ! -f "$D/dagger_r4.h5" ]; then
  guard dagger_r4 900 || exit 0
  run dagger_r4 python tools/train_policy.py dagger \
    --ckpt "$ART/joint_dagger3_final.pth" \
    --trials 24 --batch 24 --seed 80000 --name dagger_r4 || exit 1
fi

# ---------------- 3. rigid-dynamics DAgger set ----------------
if [ ! -f "$D/dagger_rigid.h5" ]; then
  guard dagger_rigid 900 || exit 0
  run dagger_rigid python tools/train_policy.py dagger \
    --ckpt "$ART/policy_best.pth" --dynamics rigid \
    --trials 24 --batch 24 --seed 85000 --name dagger_rigid || exit 1
fi

# ---------------- 4. fine-tune ----------------
if [ ! -f "$ART/joint_rigid_final.pth" ]; then
  guard joint_rigid 3600 || exit 0
  run joint_rigid python tools/train_policy.py joint --epochs 5 \
    --logsub joint_rigid --resume "$ART/policy_best.pth" \
    --extra-data dagger_r3 dagger_r4 dagger_rigid || exit 1
  CK=$(pick "$LOG/joint_rigid.log")
  [ -n "$CK" ] && keep "$CK" "joint_rigid_final.pth"
fi

# ---------------- 5. evals (both dynamics) ----------------
if [ -f "$ART/joint_rigid_final.pth" ] && [ ! -f "$ART/eval_rigid_ft.json" ]; then
  guard eval_rigid_ft 800 || exit 0
  run eval_rigid_ft python tools/train_policy.py eval \
    --ckpt "$ART/joint_rigid_final.pth" --dynamics rigid \
    --trials 20 --batch 20 --seed 92000 --out-json "$ART/eval_rigid_ft.json"
fi
if [ -f "$ART/joint_rigid_final.pth" ] && [ ! -f "$ART/eval_heldout_rigid_ft.json" ]; then
  guard eval_heldout_rigid_ft 1400 || exit 0
  run eval_heldout_rigid_ft python tools/train_policy.py eval \
    --ckpt "$ART/joint_rigid_final.pth" \
    --trials 40 --batch 20 --seed 91000 --out-json "$ART/eval_heldout_rigid_ft.json"
fi

echo "=== $(date -u +%H:%M:%S) round-5e chain complete"
