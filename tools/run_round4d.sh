#!/bin/bash
# Round-4d chain — iterate DAgger to 0 crashes, then close out the round.
#
# eval_dagger.json proved the DAgger lever works (0/20 -> 15/20 success,
# 2.80 -> 0.35 mean crashes).  This chain keeps pulling it while budget
# lasts: each cycle = fresh DAgger rollouts from the best policy so far ->
# 5-epoch joint fine-tune on the aggregate -> 20-trial protocol eval
# (fixed seed 90000, comparable across cycles).  Closeout: a 40-trial
# HELD-OUT eval (seed 91000) of the overall best, a bench re-record (warms
# the reset-wiped compile cache for the driver's round-close bench), and a
# torch-parity re-check on the final checkpoint.
#
# Runs AFTER tools/run_scaleup.sh exits.  Same invariants: serial chip
# phases (ONE JAX process), keep() every artifact immediately, stop
# sentinel, per-phase budget guard.
#
#   PIPE_DEADLINE=<epoch-secs> nohup bash tools/run_round4d.sh > /tmp/round4d.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export EVFLY_OUT=${EVFLY_OUT:-/root/repo/.data/evfly}
OUT=$EVFLY_OUT
LOG=$OUT/pipeline_logs
ART=/root/repo/artifacts
mkdir -p "$LOG" "$ART"

EVAL_TRIALS=${EVAL_TRIALS:-20}
DEADLINE=${PIPE_DEADLINE:-$(( $(date +%s) + 300*60 ))}
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

# best-so-far by (mean_crashes asc, success_rate desc) over every protocol
# eval artifact; prints "<ckpt_path>"
best_ckpt() {
  python - "$ART" <<'EOF'
import json, os, sys
art = sys.argv[1]
pairs = [
    ("eval_dagger", "joint_dagger_final.pth"),
    ("eval_dagger2", "joint_dagger2_final.pth"),
    ("eval_dagger3", "joint_dagger3_final.pth"),
    ("eval_dagger4", "joint_dagger4_final.pth"),
    ("eval_dagger5", "joint_dagger5_final.pth"),
]
best, bestv = None, (1e9, 1e9)
for name, ck in pairs:
    p, c = os.path.join(art, name + ".json"), os.path.join(art, ck)
    if not (os.path.exists(p) and os.path.exists(c)):
        continue
    r = json.load(open(p))
    key = (r.get("mean_crashes", 1e9), -(r.get("success_rate") or 0.0))
    if key < bestv:
        bestv, best = key, c
print(best or "")
EOF
}

# wait for the scale-up chain to release the chip
for i in $(seq 1 240); do
  pgrep -f "run_scaleup.sh" > /dev/null 2>&1 || break
  sleep 30
done
echo "=== $(date -u +%H:%M:%S) scale-up chain gone; starting round-4d"

export EVFLY_DATASETS=simgen_forest_big,simgen_forest_big2,simgen_forest_planner

# ---------------- DAgger cycles 3..5 ----------------
for R in 3 4 5; do
  BEST=$(best_ckpt)
  [ -n "$BEST" ] || { echo "=== no eval'd checkpoint found, abort"; exit 1; }
  # a full cycle is ~65 min; don't start one we can't finish
  guard "cycle_r$R" 4200 || break
  echo "=== cycle $R base: $BEST"

  if [ ! -f "$OUT/data/datasets/dagger_r$R.h5" ]; then
    run "dagger_r$R" python tools/train_policy.py dagger --ckpt "$BEST" \
      --trials 24 --batch 24 --seed $(( 50000 + R * 10000 )) --name "dagger_r$R" \
      || break
  fi

  # aggregate the three newest DAgger sets (HBM budget: base mix ~52k
  # frames + 3 x ~6.6k; dropping the oldest set keeps residency bounded
  # while staying on-policy-recent)
  EXTRA=""
  for S in $(seq 1 $R); do [ -f "$OUT/data/datasets/dagger_r$S.h5" ] && EXTRA="$EXTRA dagger_r$S"; done
  EXTRA=$(echo $EXTRA | tr ' ' '\n' | tail -3 | tr '\n' ' ')
  echo "=== cycle $R extra-data: $EXTRA"

  if [ ! -f "$ART/joint_dagger${R}_final.pth" ]; then
    run "joint_dagger$R" python tools/train_policy.py joint --epochs 5 \
      --logsub "joint_dagger$R" --resume "$BEST" --extra-data $EXTRA || break
    CK=$(pick "$LOG/joint_dagger$R.log")
    [ -n "$CK" ] && keep "$CK" "joint_dagger${R}_final.pth"
  fi

  if [ -f "$ART/joint_dagger${R}_final.pth" ] && [ ! -f "$ART/eval_dagger$R.json" ]; then
    guard "eval_dagger$R" 700 || break
    run "eval_dagger$R" python tools/train_policy.py eval \
      --ckpt "$ART/joint_dagger${R}_final.pth" \
      --trials "$EVAL_TRIALS" --batch "$EVAL_TRIALS" \
      --out-json "$OUT/eval_dagger$R.json"
    keep "$OUT/eval_dagger$R.json"
  fi
done

# ---------------- closeout ----------------
BEST=$(best_ckpt)
echo "=== final best: $BEST"
cp -f "$BEST" "$ART/policy_best.pth"

if [ ! -f "$ART/eval_final.json" ] && guard eval_final 1100; then
  run eval_final python tools/train_policy.py eval --ckpt "$ART/policy_best.pth" \
    --trials 40 --batch 20 --seed 91000 --out-json "$OUT/eval_final.json"
  keep "$OUT/eval_final.json"
fi

if [ ! -f "$ART/bench_r4d.json" ] && guard bench 900; then
  run bench_r4d python bench.py
  grep -o '{.*}' "$LOG/bench_r4d.log" | tail -1 > "$ART/bench_r4d.json"
  echo "=== bench: $(cat "$ART/bench_r4d.json")"
fi

if [ ! -f "$ART/parity_closed_loop_final.json" ] && guard parity_final 900; then
  run parity_final python tools/torch_parity_closed_loop.py --ckpt "$ART/policy_best.pth"
  grep -o '{.*}' "$LOG/parity_final.log" | tail -1 > "$ART/parity_closed_loop_final.json"
  echo "=== parity: $(cat "$ART/parity_closed_loop_final.json")"
fi

echo "=== $(date -u +%H:%M:%S) round-4d chain complete"
