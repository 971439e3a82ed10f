#!/bin/bash
# Round-5 chain — finish the DAgger ladder + closeout (VERDICT r4 next #3).
#
# Round-4f trained joint_dagger3 but ran out of budget before evaluating
# it.  This chain: (1) protocol-evals dagger3, (2) continues DAgger cycles
# up to r6 from the best-so-far, (3) closes out with a 40-trial held-out
# eval + closed-loop torch parity on the final best, (4) flies the
# pilot-flown HIL episode (arm -> takeoff -> run -> land; sim/pilot.py)
# with the best checkpoint for the mode-transition artifact.
#
# Invariants: serial chip phases (ONE JAX process on this machine —
# CLAUDE.md), keep() every artifact the moment it exists, stop sentinel
# (/tmp/pipeline_stop), per-phase budget guard.
#
#   PIPE_DEADLINE=<epoch-secs> nohup bash tools/run_round5.sh > /tmp/round5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export EVFLY_OUT=${EVFLY_OUT:-/root/repo/.data/evfly}
export EVFLY_DATASETS=simgen_forest_big,simgen_forest_big2,simgen_forest_planner
OUT=$EVFLY_OUT
LOG=$OUT/pipeline_logs
ART=/root/repo/artifacts
D=$OUT/data/datasets
mkdir -p "$LOG" "$ART" "$D"

EVAL_TRIALS=${EVAL_TRIALS:-20}
DEADLINE=${PIPE_DEADLINE:-$(( $(date +%s) + 420*60 ))}
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
pairs = [("eval_dagger%s" % (s or ""), "joint_dagger%s_final.pth" % (s or ""))
         for s in ["", "2", "3", "4", "5", "6"]]
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

df -h / | tail -1

# ---------------- eval the orphaned dagger3 checkpoint ----------------
if [ -f "$ART/joint_dagger3_final.pth" ] && [ ! -f "$ART/eval_dagger3.json" ]; then
  guard eval_dagger3 900 || exit 0
  run eval_dagger3 python tools/train_policy.py eval \
    --ckpt "$ART/joint_dagger3_final.pth" \
    --trials "$EVAL_TRIALS" --batch "$EVAL_TRIALS" \
    --out-json "$OUT/eval_dagger3.json"
  keep "$OUT/eval_dagger3.json"
fi

# ---------------- DAgger cycles 4..6 ----------------
for R in 4 5 6; do
  BEST=$(best_ckpt)
  [ -n "$BEST" ] || { echo "=== no eval'd checkpoint found, abort"; exit 1; }
  # a full cycle is ~30-40 min warm-cache; don't start one we can't finish
  guard "cycle_r$R" 3000 || break
  echo "=== cycle $R base: $BEST"

  if [ ! -f "$D/dagger_r$R.h5" ] && [ ! -f "$D/dagger_r$R.h5.stat.json" ]; then
    run "dagger_r$R" python tools/train_policy.py dagger --ckpt "$BEST" \
      --trials 24 --batch 24 --seed $(( 40000 + R * 10000 )) --name "dagger_r$R" \
      || break
  fi

  # aggregate the three newest DAgger sets (device-residency budget:
  # base mix + 3 x ~6.6k frames; on-policy-recent)
  EXTRA=""
  for S in $(seq 1 $R); do
    { [ -f "$D/dagger_r$S.h5" ] || [ -f "$D/dagger_r$S.h5.stat.json" ]; } \
      && EXTRA="$EXTRA dagger_r$S"
  done
  EXTRA=$(echo $EXTRA | tr ' ' '\n' | tail -3 | tr '\n' ' ')
  echo "=== cycle $R extra-data: $EXTRA"

  if [ ! -f "$ART/joint_dagger${R}_final.pth" ]; then
    run "joint_dagger$R" python tools/train_policy.py joint --epochs 5 \
      --logsub "joint_dagger$R" --resume "$BEST" --extra-data $EXTRA || break
    CK=$(pick "$LOG/joint_dagger$R.log")
    [ -n "$CK" ] && keep "$CK" "joint_dagger${R}_final.pth"
    # the joint phase cached the new dagger set on first load; free its h5
    python tools/stamp_and_rm_h5.py "$D/dagger_r$R" || true
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

# ---------------- closeout (only if the best changed) ----------------
BEST=$(best_ckpt)
echo "=== final best: $BEST"
if [ -n "$BEST" ] && ! cmp -s "$BEST" "$ART/policy_best.pth"; then
  cp -f "$BEST" "$ART/policy_best.pth"
  if guard eval_final_v2 1100; then
    run eval_final_v2 python tools/train_policy.py eval --ckpt "$ART/policy_best.pth" \
      --trials 40 --batch 20 --seed 91000 --out-json "$OUT/eval_final_v2.json"
    keep "$OUT/eval_final_v2.json"
  fi
  if guard parity_final_v2 900; then
    run parity_final_v2 python tools/torch_parity_closed_loop.py --ckpt "$ART/policy_best.pth"
    grep -o '{.*}' "$LOG/parity_final_v2.log" | tail -1 > "$ART/parity_closed_loop_final.json"
    echo "=== parity: $(cat "$ART/parity_closed_loop_final.json")"
  fi
else
  echo "=== best unchanged; prior eval_final stands"
fi

# ---------------- pilot-flown HIL episode (VERDICT r4 next #5) ----------------
if guard hil_pilot 900; then
  run hil_pilot python tools/hil_real_model.py --ckpt "$ART/policy_best.pth" \
    --pilot --duration 8 --out-json "$ART/hil_pilot.json"
fi

# ---------------- benchmark with variance (VERDICT r4 next #4) ----------------
if guard bench 900; then
  run bench python bench.py
  grep -o '{.*}' "$LOG/bench.log" | tail -1 > "$ART/bench_r5.json"
  grep "bench reps" "$LOG/bench.log" || true
fi

echo "=== $(date -u +%H:%M:%S) round-5 chain complete"
