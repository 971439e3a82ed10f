#!/bin/bash
# Round-5f — post-chain chip work (runs after run_round5e.sh exits).
#
# Waits for the round-5e chain to release the chip, then serially (ONE
# JAX-on-TPU process at a time — CLAUDE.md):
#   1. latency_bench        -> artifacts/latency_r05.json  (refresh r04 artifact)
#   2. train_rl vision      -> artifacts/rl_vision.json    (PPO at reference
#      100-env scale on a forest field — the flightpy/flightrl path, on-chip)
#   3. train_rl quadrotor   -> artifacts/rl_quadrotor.json (hover stabilization)
#   4. bench.py             -> artifacts/bench_r5f.json    (headline confirm)
#
#   PIPE_DEADLINE=<epoch-secs> nohup bash tools/run_round5f.sh > /tmp/round5f.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
ART=/root/repo/artifacts
mkdir -p "$ART" /tmp/r5f_logs

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
  "$@" > "/tmp/r5f_logs/$name.log" 2>&1
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) $name rc=$rc"
  tail -4 "/tmp/r5f_logs/$name.log"
  sleep 15
  return $rc
}

# wait for the 5e chain (and any other python) to release the chip
if [ -f /tmp/round5e.pid ]; then
  while kill -0 "$(cat /tmp/round5e.pid)" 2>/dev/null; do
    sleep 60
    if [ -f /tmp/pipeline_stop ]; then echo "stop sentinel while waiting"; exit 0; fi
  done
  echo "=== $(date -u +%H:%M:%S) round-5e chain exited"
  sleep 30
fi

if guard latency_r05 600; then
  run latency_r05 timeout 900 python tools/latency_bench.py
  grep -o '{.*}' /tmp/r5f_logs/latency_r05.log | tail -1 > "$ART/latency_r05.json" || true
  [ -s "$ART/latency_r05.json" ] || rm -f "$ART/latency_r05.json"
fi

if guard rl_vision 900; then
  run rl_vision timeout 2400 python tools/train_rl.py --env vision \
    --iters 600 --num-envs 100 --rollout 128 \
    --out-json "$ART/rl_vision.json"
fi

if guard rl_quadrotor 900; then
  run rl_quadrotor timeout 2400 python tools/train_rl.py --env quadrotor \
    --iters 600 --num-envs 100 --rollout 128 \
    --out-json "$ART/rl_quadrotor.json"
fi

if guard bench_confirm 600; then
  run bench_confirm timeout 1200 python bench.py
  grep -o '{"metric.*}' /tmp/r5f_logs/bench_confirm.log | tail -1 > "$ART/bench_r5f.json" || true
  [ -s "$ART/bench_r5f.json" ] || rm -f "$ART/bench_r5f.json"
fi

echo "=== $(date -u +%H:%M:%S) round-5f chain complete"
