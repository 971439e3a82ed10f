#!/bin/bash
# Round-4 scale-up chain — runs AFTER the minimum-viable chain produced
# eval_joint.json (tools/run_policy_pipeline.sh).  Trains the policy at
# ~3.2x the MV data scale (simgen_forest_big + big2 + planner, ~52k frames)
# with the grouped epoch-scan (cfg.scan_group) train path, then runs two
# DAgger rounds (Ross et al. 2011; reference analog: the covariate-shift
# motivation behind evfly's pretrained-V(phi) + fine-tune recipe), with the
# reference-protocol eval (reach x=60 m, 0 crashes;
# /root/reference/envtest/ros/evaluation_node.py:247-268) after every stage.
#
# Same invariants as run_policy_pipeline.sh: serial phases (ONE JAX process),
# artifact-gated + keep() the moment an output exists, stop sentinel,
# deadline guard.
#
#   PIPE_DEADLINE=<epoch-secs> nohup bash tools/run_scaleup.sh > /tmp/scaleup.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export EVFLY_OUT=${EVFLY_OUT:-/root/repo/.data/evfly}
OUT=$EVFLY_OUT
LOG=$OUT/pipeline_logs
ART=/root/repo/artifacts
mkdir -p "$LOG" "$ART" "$OUT/data/datasets"

EVAL_TRIALS=${EVAL_TRIALS:-20}
DEADLINE=${PIPE_DEADLINE:-$(( $(date +%s) + 150*60 ))}
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
  sleep 15
  return $rc
}

keep() {
  [ -e "$1" ] && cp -f "$1" "$ART/${2:-$(basename "$1")}" && echo "kept $1 -> $ART/${2:-$(basename "$1")}"
}

pick() { grep -o -- '-> .*\.pth' "$1" 2>/dev/null | tail -1 | cut -c4-; }

train_phase() {
  local name=$1 art=$2; shift 2
  if [ -f "$ART/$art" ]; then
    echo "=== $name: artifact $art present, skipping"
    return 0
  fi
  run "$name" python tools/train_policy.py "$@" || return 1
  local ck; ck=$(pick "$LOG/$name.log")
  [ -n "$ck" ] && keep "$ck" "$art"
}

eval_phase() { # eval_phase <name> <ckpt>
  local name=$1 ck=$2
  [ -f "$ART/$name.json" ] && { echo "=== $name: present, skipping"; return 0; }
  guard "$name" 700 || return 1
  run "$name" python tools/train_policy.py eval --ckpt "$ck" \
    --trials "$EVAL_TRIALS" --batch "$EVAL_TRIALS" --out-json "$OUT/$name.json"
  keep "$OUT/$name.json"
}

# wait for the separately-launched datagen to finish writing both h5s
for i in $(seq 1 120); do
  [ -f "$OUT/data/datasets/simgen_forest_big2.h5" ] && \
  [ -f "$OUT/data/datasets/simgen_forest_planner.h5" ] && break
  sleep 30
done
export EVFLY_DATASETS=simgen_forest_big,simgen_forest_big2,simgen_forest_planner

# ---------------- scaled training (warm-started from the MV joint) ----------------
# The MV chain already demonstrated the reference pretrain->combine->joint
# recipe (artifacts/eval_joint.json); the scale-up resumes the COMBINED MV
# joint checkpoint directly on the 3x data mix — every training minute goes
# to the serving model, and the saved pretrain time funds two DAgger rounds
# (the covariate-shift lever the eval numbers say we need).

guard joint_v2 2400 || exit 0
train_phase joint_v2 joint_v2.pth \
  joint --epochs 10 --logsub joint_v2 --resume "$ART/joint_final.pth" || exit 1
J2=$ART/joint_v2.pth

eval_phase eval_joint_v2 "$J2"

# ---------------- DAgger round 1 ----------------

if [ ! -f "$OUT/data/datasets/dagger_r1.h5" ]; then
  # 24 trials/round: two DAgger sets (~6.6k frames each) must fit the
  # device-resident HBM budget on top of the ~46k-frame base mix
  guard dagger_r1 900 && \
  run dagger_r1 python tools/train_policy.py dagger --ckpt "$J2" \
    --trials 24 --batch 24 --name dagger_r1
fi
if [ -f "$OUT/data/datasets/dagger_r1.h5" ]; then
  guard joint_dagger 2400 && train_phase joint_dagger joint_dagger_final.pth \
    joint --epochs 5 --logsub joint_dagger --resume "$J2" --extra-data dagger_r1
fi
JD1=$ART/joint_dagger_final.pth
[ -f "$JD1" ] && eval_phase eval_dagger "$JD1"

# ---------------- DAgger round 2 ----------------

if [ -f "$JD1" ] && [ ! -f "$OUT/data/datasets/dagger_r2.h5" ]; then
  guard dagger_r2 900 && \
  run dagger_r2 python tools/train_policy.py dagger --ckpt "$JD1" \
    --trials 24 --batch 24 --seed 60000 --name dagger_r2
fi
if [ -f "$OUT/data/datasets/dagger_r2.h5" ]; then
  guard joint_dagger2 2400 && train_phase joint_dagger2 joint_dagger2_final.pth \
    joint --epochs 5 --logsub joint_dagger2 --resume "$JD1" \
    --extra-data dagger_r1 dagger_r2
fi
JD2=$ART/joint_dagger2_final.pth
[ -f "$JD2" ] && eval_phase eval_dagger2 "$JD2"

# ---------------- fixed followups (failed in the MV chain) ----------------

make -C evfly_tpu/native >/dev/null 2>&1   # hil needs libflightcore.so (wiped between rounds)
BEST=$JD2; [ -f "$BEST" ] || BEST=$JD1; [ -f "$BEST" ] || BEST=$J2
if [ ! -f "$ART/hil_real.json" ] && guard hil_real 600; then
  run hil_real python tools/hil_real_model.py --ckpt "$BEST" \
    --out-json "$ART/hil_real.json"
fi
if [ ! -f "$ART/dp_quality.json" ] && guard dp_quality 1500; then
  run dp_quality env JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/dp_quality.py \
    --src "$OUT/data/datasets/simgen_forest_big.h5" \
    --out-json "$ART/dp_quality.json"
fi

echo "=== scale-up pipeline complete"
