#!/bin/bash
# Round-4 policy pipeline — restructured per VERDICT r3 "Next round" #1:
# the schedule fits the round BY CONSTRUCTION.
#
#   * MINIMUM-VIABLE CHAIN FIRST: small dataset (MV_TRIALS expert trials),
#     MV_EPOCHS per training phase, protocol eval — so eval_joint.json
#     exists early in the round; everything after is upside.
#   * EVERY phase output is copied into /root/repo/artifacts/ the moment it
#     exists (keep()), and every phase is SKIPPED when its artifact is
#     already present — rounds accumulate instead of restarting.
#   * The data root defaults to /root/repo/.data/evfly (gitignored, inside
#     the durable repo) because /data is wiped between rounds.
#   * After the MV eval: the followup measurements VERDICT r3 #3-#5 ordered
#     (closed-loop torch parity, HIL with the real model, chunk-DP quality,
#     serving latency, bf16-encoder A/B), then scale-up (planner data,
#     DAgger, re-eval) with whatever budget remains.
#
#   PIPE_DEADLINE=<epoch-secs> nohup bash tools/run_policy_pipeline.sh > /tmp/pipeline.log 2>&1 &
#
# One JAX process at a time on this machine (CLAUDE.md): all phases run
# serially in this one chain.  touch /tmp/pipeline_stop for a clean exit
# between phases.
set -u
cd "$(dirname "$0")/.."
export EVFLY_OUT=${EVFLY_OUT:-/root/repo/.data/evfly}
OUT=$EVFLY_OUT
LOG=$OUT/pipeline_logs
ART=/root/repo/artifacts
mkdir -p "$LOG" "$ART" "$OUT/data/datasets"

MV_TRIALS=${MV_TRIALS:-60}
MV_EPOCHS=${MV_EPOCHS:-3}
EVAL_TRIALS=${EVAL_TRIALS:-20}
# default deadline: launch + 100 min (rounds are ~2.5-2.9 h total and the
# pipeline never starts at minute zero); pass PIPE_DEADLINE to override.
DEADLINE=${PIPE_DEADLINE:-$(( $(date +%s) + 100*60 ))}
left() { echo $(( DEADLINE - $(date +%s) )); }

guard() { # guard <phase> [min-seconds-needed]: stop sentinel + budget skip
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

run() { # run <name> <cmd...>: log to $LOG/<name>.log, echo rc + tail
  local name=$1; shift
  echo "=== $(date -u +%H:%M:%S) $name: $*"
  "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) $name rc=$rc"
  tail -4 "$LOG/$name.log"
  sleep 15   # let the axon tunnel settle between JAX processes
  return $rc
}

keep() { # keep <src> [dstname]: copy an artifact into the durable repo dir
  [ -e "$1" ] && cp -f "$1" "$ART/${2:-$(basename "$1")}" && echo "kept $1 -> $ART/${2:-$(basename "$1")}"
}

pick() { # final checkpoint path printed by train_policy._train
  grep -o -- '-> .*\.pth' "$1" 2>/dev/null | tail -1 | cut -c4-
}

# train_phase <name> <artifact.pth> <train_policy args...>:
# artifact-gated + durable the moment it finishes.
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

# ---------------- minimum-viable chain ----------------

export EVFLY_DATASETS=simgen_forest_big

if [ ! -f "$OUT/data/datasets/simgen_forest_big.h5" ]; then
  guard datagen_mv || exit 0
  run datagen_mv python tools/datagen.py --out "$OUT" --trials "$MV_TRIALS" \
    --batch 20 --mode state --name simgen_forest_big --seed 100 || exit 1
fi

train_phase pretrain_v pretrain_v_final.pth \
  pretrain_v --epochs "$MV_EPOCHS" || exit 1
train_phase pretrain_d pretrain_d_final.pth \
  pretrain_d --epochs "$MV_EPOCHS" || exit 1
train_phase joint joint_final.pth \
  joint --epochs "$MV_EPOCHS" \
  --d-ckpt "$ART/pretrain_d_final.pth" --v-ckpt "$ART/pretrain_v_final.pth" || exit 1
J_CKPT=$ART/joint_final.pth
echo "JOINT=$J_CKPT"

if [ ! -f "$ART/eval_joint.json" ]; then
  guard eval_joint
  run eval_joint python tools/train_policy.py eval --ckpt "$J_CKPT" \
    --trials "$EVAL_TRIALS" --batch "$EVAL_TRIALS" --out-json "$OUT/eval_joint.json"
  keep "$OUT/eval_joint.json"
fi
echo "=== $(date -u +%H:%M:%S) MV chain complete (eval_joint.json durable)"

# ---------------- followup measurements (VERDICT r3 #3-#5) ----------------

if [ ! -f "$ART/parity_closed_loop.json" ] && guard parity_closed_loop 600; then
  run parity_closed_loop python tools/torch_parity_closed_loop.py \
    --ckpt "$J_CKPT" --frames 120
  grep -o '{.*}' "$LOG/parity_closed_loop.log" | tail -1 > "$ART/parity_closed_loop.json"
fi

if [ ! -f "$ART/hil_real.json" ] && guard hil_real 600; then
  # the native .so is a build product (gitignored) — gone after a wipe
  make -C evfly_tpu/native >/dev/null 2>&1
  run hil_real python tools/hil_real_model.py --ckpt "$J_CKPT" \
    --out-json "$ART/hil_real.json"
fi

if [ ! -f "$ART/dp_quality.json" ] && guard dp_quality 900; then
  # chunk-DP quality runs on the virtual 8-CPU mesh, not the chip
  run dp_quality env JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/dp_quality.py \
    --src "$OUT/data/datasets/simgen_forest_big.h5" \
    --out-json "$ART/dp_quality.json"
fi

if [ ! -f "$ART/latency_r04.json" ] && guard latency 600; then
  run latency python tools/latency_bench.py
  grep '^{' "$LOG/latency.log" | tail -1 > "$ART/latency_r04.json"
fi

if [ ! -f "$ART/bench_ab_bf16.json" ] && guard bench_ab 900; then
  run bf16_accept python tools/bf16_accept.py
  run bench_b0 env BENCH_BF16ENC=0 python bench.py
  run bench_b1 env BENCH_BF16ENC=1 python bench.py
  python - "$LOG/bf16_accept.log" "$LOG/bench_b0.log" "$LOG/bench_b1.log" \
    > "$ART/bench_ab_bf16.json" <<'EOF'
import json, sys
out = {}
acc = [l for l in open(sys.argv[1]).read().splitlines() if l.startswith("{")]
out["accept"] = json.loads(acc[-1]) if acc else None
for tag, path in (("f32enc", sys.argv[2]), ("bf16enc", sys.argv[3])):
    txt = open(path).read()
    js = [l for l in txt.splitlines() if l.startswith('{"metric"')]
    out[tag] = json.loads(js[-1]) if js else None
print(json.dumps(out, indent=2))
EOF
fi

echo "=== $(date -u +%H:%M:%S) followups complete"

# ---------------- scale-up (budget permitting) ----------------

if [ ! -f "$OUT/data/datasets/simgen_forest_planner.h5" ]; then
  guard datagen_planner 1500 && \
  run datagen_planner python tools/datagen.py --out "$OUT" --trials 40 \
    --batch 20 --mode planner --name simgen_forest_planner --seed 200
fi
[ -f "$OUT/data/datasets/simgen_forest_planner.h5" ] && \
  export EVFLY_DATASETS=simgen_forest_big,simgen_forest_planner

if [ ! -f "$ART/joint_dagger_final.pth" ]; then
  if guard dagger 2700 && [ ! -f "$OUT/data/datasets/dagger_r1.h5" ]; then
    run dagger python tools/train_policy.py dagger --ckpt "$J_CKPT" \
      --trials 20 --batch 20
  fi
  if [ -f "$OUT/data/datasets/dagger_r1.h5" ] && guard joint_dagger 1800; then
    train_phase joint_dagger joint_dagger_final.pth \
      joint --epochs "$MV_EPOCHS" --logsub joint_dagger \
      --resume "$J_CKPT" --extra-data dagger_r1
  fi
fi

if [ -f "$ART/joint_dagger_final.pth" ] && [ ! -f "$ART/eval_dagger.json" ]; then
  guard eval_dagger 700 && {
    run eval_dagger python tools/train_policy.py eval \
      --ckpt "$ART/joint_dagger_final.pth" \
      --trials "$EVAL_TRIALS" --batch "$EVAL_TRIALS" --out-json "$OUT/eval_dagger.json"
    keep "$OUT/eval_dagger.json"
  }
fi

echo "=== pipeline complete"
