#!/usr/bin/env bash
# Round-3 session-4 orchestrator: the VM reset wiped the round-3 session-1
# rehearsal artifacts (/root/rehearsal), so the r3b predict-tail / step9
# items fail fast on the missing corpus.  This queue restores the composed
# pipeline evidence on a fresh quarter-scale corpus and then runs the
# r3c/r3d measurement tails against it:
#
#   1. wait for round3b_queue.sh's completion marker
#   2. v2 dress rehearsal: the REAL train.sh (steps 0-9) + predict.sh
#      (all 7 members + category-aware ensemble + validated result.zip)
#      end-to-end on /root/rehearsal2 (16k train pairs / 40k items /
#      ~85k KG entities; EPOCHS=1, KGE_EPOCHS=50) — the full-scale
#      per-member wall-clocks were measured in session 1; this run proves
#      the COMPLETE chain (the 7-member tail died in the tunnel outage)
#   3. round3c_queue.sh with DATA_DIR=/root/rehearsal2 (attention-kernel
#      rows after the exact-max fix + the step-4 accumulation re-measure)
#   4. round3d_queue.sh (fused-QKV A/B rows)
#
#   DEADLINE=<unix_s> bash scripts/round3e_queue.sh
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${OUT:-/root/bench_r3}
DEADLINE=${DEADLINE:-0}
REHEARSAL2=${REHEARSAL2:-/root/rehearsal2}
mkdir -p "$OUT"

echo "waiting for round3b 'queue complete' marker ..."
while ! grep -q "\[r3b\] queue complete" "$OUT/queue.log" 2>/dev/null; do
  sleep 60
done
echo "round3b done; round3e begins @ $(date +%s)" | tee -a "$OUT/queue.log"

left() { echo $((DEADLINE - $(date +%s))); }

# 2. v2 rehearsal, bounded so the r3c/r3d tails still get a window
REH_T=16200
if [ "$DEADLINE" != 0 ]; then
  l=$(left)
  if [ "$l" -lt 1200 ]; then
    echo "=== [r3e] rehearsal2 SKIPPED (deadline) @ $(date +%s) ===" \
      | tee -a "$OUT/queue.log"
  else
    [ $((l - 4500)) -lt "$REH_T" ] && REH_T=$((l - 4500))
    [ "$REH_T" -lt 1200 ] && REH_T=1200
  fi
fi
echo "=== [r3e] rehearsal2 (timeout ${REH_T}s) @ $(date +%s) ===" \
  | tee -a "$OUT/queue.log"
DATA_DIR="$REHEARSAL2" timeout "$REH_T" bash scripts/rehearsal.sh \
  > "$OUT/rehearsal2.log" 2>&1
echo "=== [r3e] rehearsal2 rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"

# 3+4. measurement tails (their own scripts re-check the markers + deadline)
DATA_DIR="$REHEARSAL2" DEADLINE="$DEADLINE" bash scripts/round3c_queue.sh \
  > "$OUT/r3c_driver.log" 2>&1
DEADLINE="$DEADLINE" bash scripts/round3d_queue.sh \
  > "$OUT/r3d_driver.log" 2>&1
echo "=== [r3e] queue complete @ $(date +%s) ===" | tee -a "$OUT/queue.log"
