#!/usr/bin/env bash
# Round-3 tail: after round3g, validate the updated bench.py (now carrying
# flagship_train_pairs_per_sec for BENCH_r03) once on hardware, so the
# driver's end-of-round run has a known-good program behind it.
#
#   DEADLINE=<unix_s> bash scripts/round3h_queue.sh
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${OUT:-/root/bench_r3}
DEADLINE=${DEADLINE:-0}
mkdir -p "$OUT"

echo "waiting for round3g marker ..."
while ! grep -q "\[r3g\] queue complete" "$OUT/queue.log" 2>/dev/null; do
  sleep 60
done
echo "round3g done; round3h begins @ $(date +%s)" | tee -a "$OUT/queue.log"

t=1200
if [ "$DEADLINE" != 0 ]; then
  l=$((DEADLINE - $(date +%s)))
  if [ "$l" -lt 180 ]; then
    echo "=== [r3h] bench_final SKIPPED (deadline) @ $(date +%s) ===" \
      | tee -a "$OUT/queue.log"
    exit 0
  fi
  [ "$l" -lt "$t" ] && t=$l
fi
echo "=== [r3h] bench_final @ $(date +%s) ===" | tee -a "$OUT/queue.log"
timeout "$t" python bench.py > "$OUT/bench_final.log" 2>&1
echo "=== [r3h] bench_final rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"
