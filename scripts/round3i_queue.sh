#!/usr/bin/env bash
# Round-3 step-9 recovery: the v2 rehearsal's pred-text wedged in a
# tunnel-outage aftermath (zero syscalls, pure host spin after a
# remote_compile broken pipe; /root/bench_r3/rehearsal2.log 13:35) and was
# killed so predict.sh could run inside the rehearsal timeout.  This queue
# waits for round3h, re-runs train.sh step 9 (build-graph + pred-text +
# finetune-graph) against the v2 corpus, and regenerates the measured
# per-step table.
#
#   DEADLINE=<unix_s> bash scripts/round3i_queue.sh
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${OUT:-/root/bench_r3}
DEADLINE=${DEADLINE:-0}
REHEARSAL2=${REHEARSAL2:-/root/rehearsal2}
mkdir -p "$OUT"

echo "waiting for round3h marker ..."
while ! grep -qE "\[r3h\] bench_final (rc=|SKIPPED)" "$OUT/queue.log" 2>/dev/null; do
  sleep 60
done
echo "round3h done; round3i begins @ $(date +%s)" | tee -a "$OUT/queue.log"

T=3600
if [ "$DEADLINE" != 0 ]; then
  l=$((DEADLINE - $(date +%s)))
  if [ "$l" -lt 300 ]; then
    echo "=== [r3i] step9 SKIPPED (deadline) @ $(date +%s) ===" \
      | tee -a "$OUT/queue.log"
    exit 0
  fi
  [ "$l" -lt "$T" ] && T=$l
fi
echo "=== [r3i] step9-retry (timeout ${T}s) @ $(date +%s) ===" \
  | tee -a "$OUT/queue.log"
DATA_DIR="$REHEARSAL2" START_AT=9-gcn STOP_AFTER=9-gcn \
  timeout "$T" bash scripts/train.sh \
  > "$REHEARSAL2/train_log2.txt" 2>&1
echo "=== [r3i] step9-retry rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"

python scripts/summarize_rehearsal.py "$REHEARSAL2" \
  > "$OUT/rehearsal2_steps.md" 2>&1
echo "=== [r3i] queue complete @ $(date +%s) ===" | tee -a "$OUT/queue.log"
