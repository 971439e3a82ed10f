#!/bin/bash
# Round-5b closeout — the tail of tools/run_round5.sh that the machine
# reset cut off (chain died after eval_dagger4; policy_best was never
# updated and the held-out eval / parity / HIL-pilot / bench never ran).
#
# Phases (serial, ONE JAX-on-TPU process at a time — CLAUDE.md):
#   1. held-out 40-trial protocol evals (seed 91000, never used in
#      training or DAgger) of BOTH zero-crash cycle checkpoints
#      (joint_dagger3/4) — pick policy_best by held-out performance,
#      not by the in-distribution tie.
#   2. closed-loop torch parity on policy_best.
#   3. pilot-flown HIL episode (arm -> takeoff -> run -> land).
#   4. headline bench with variance -> artifacts/bench_r5.json.
#
#   PIPE_DEADLINE=<epoch-secs> nohup bash tools/run_round5b.sh > /tmp/round5b.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export EVFLY_OUT=${EVFLY_OUT:-/root/repo/.data/evfly}
OUT=$EVFLY_OUT
LOG=$OUT/pipeline_logs
ART=/root/repo/artifacts
mkdir -p "$LOG" "$ART"

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

df -h / | tail -1

# ---------------- held-out evals of the two zero-crash checkpoints ----------------
for R in 3 4; do
  CK=$ART/joint_dagger${R}_final.pth
  J=$ART/eval_heldout_dagger${R}.json
  [ -f "$CK" ] || continue
  [ -f "$J" ] && continue
  guard "heldout_dagger$R" 1500 || exit 0
  run "heldout_dagger$R" python tools/train_policy.py eval \
    --ckpt "$CK" --trials 40 --batch 20 --seed 91000 \
    --out-json "$OUT/eval_heldout_dagger${R}.json"
  keep "$OUT/eval_heldout_dagger${R}.json"
done

# ---------------- pick policy_best by held-out performance ----------------
WIN=$(python - "$ART" <<'EOF'
import json, os, sys
art = sys.argv[1]
best, bestv = "", (1e9, 1e9, 1e9)
for r in (3, 4):
    p = os.path.join(art, f"eval_heldout_dagger{r}.json")
    c = os.path.join(art, f"joint_dagger{r}_final.pth")
    if not (os.path.exists(p) and os.path.exists(c)):
        continue
    d = json.load(open(p))
    key = (d.get("mean_crashes", 1e9), -(d.get("success_rate") or 0.0),
           sum(d.get("time_to_finish", [1e9])) / max(1, len(d.get("time_to_finish", [1]))))
    if key < bestv:
        bestv, best = key, c
print(best)
EOF
)
echo "=== held-out winner: $WIN"
if [ -n "$WIN" ]; then
  cp -f "$WIN" "$ART/policy_best.pth"
  R=$(echo "$WIN" | grep -o 'dagger[0-9]' | grep -o '[0-9]')
  cp -f "$ART/eval_heldout_dagger${R}.json" "$ART/eval_final_v2.json"
fi

# ---------------- closed-loop torch parity on the final policy ----------------
if guard parity_final_v2 900; then
  run parity_final_v2 python tools/torch_parity_closed_loop.py --ckpt "$ART/policy_best.pth"
  grep -o '{.*}' "$LOG/parity_final_v2.log" | tail -1 > "$ART/parity_closed_loop_final.json"
  echo "=== parity: $(cat "$ART/parity_closed_loop_final.json")"
fi

# ---------------- pilot-flown HIL episode (VERDICT r4 next #5) ----------------
if guard hil_pilot 900; then
  run hil_pilot python tools/hil_real_model.py --ckpt "$ART/policy_best.pth" \
    --pilot --duration 8 --out-json "$ART/hil_pilot.json"
  [ -f "$ART/hil_pilot.json" ] && python - <<'EOF'
import json
d = json.load(open("/root/repo/artifacts/hil_pilot.json"))
print("hil_pilot transitions:", d.get("pilot_transitions"))
EOF
fi

# ---------------- benchmark with variance ----------------
if guard bench 900; then
  run bench python bench.py
  grep -o '{.*}' "$LOG/bench.log" | tail -1 > "$ART/bench_r5.json"
  cat "$ART/bench_r5.json"
fi

echo "=== $(date -u +%H:%M:%S) round-5b closeout complete"
