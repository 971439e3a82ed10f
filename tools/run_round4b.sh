#!/bin/bash
# Round-4 second-half driver: the machine was reset mid-round (datasets under
# /root/repo/.data were wiped with the filesystem), so regenerate the full
# scale-up data mix serially (ONE JAX process at a time, CLAUDE.md), then
# hand off to tools/run_scaleup.sh (warm-started scaled training + two DAgger
# rounds + protocol evals + followups).
#
#   PIPE_DEADLINE=<epoch-secs> nohup bash tools/run_round4b.sh > /tmp/round4b.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export EVFLY_OUT=${EVFLY_OUT:-/root/repo/.data/evfly}
OUT=$EVFLY_OUT
LOG=$OUT/pipeline_logs
mkdir -p "$LOG" "$OUT/data/datasets"

run() {
  local name=$1; shift
  echo "=== $(date -u +%H:%M:%S) $name: $*"
  "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) $name rc=$rc"
  tail -3 "$LOG/$name.log"
  sleep 15
  return $rc
}

D=$OUT/data/datasets
[ -f /tmp/pipeline_stop ] && exit 0
if [ ! -f "$D/simgen_forest_big.h5" ]; then
  run datagen_big python tools/datagen.py --out "$OUT" --trials 60 \
    --batch 20 --mode state --name simgen_forest_big --seed 100 || exit 1
fi
[ -f /tmp/pipeline_stop ] && exit 0
if [ ! -f "$D/simgen_forest_big2.h5" ]; then
  run datagen_big2 python tools/datagen.py --out "$OUT" --trials 80 \
    --batch 20 --mode state --name simgen_forest_big2 --seed 300 || exit 1
fi
[ -f /tmp/pipeline_stop ] && exit 0
if [ ! -f "$D/simgen_forest_planner.h5" ]; then
  run datagen_planner python tools/datagen.py --out "$OUT" --trials 40 \
    --batch 20 --mode planner --name simgen_forest_planner --seed 200 || exit 1
fi

exec bash tools/run_scaleup.sh
