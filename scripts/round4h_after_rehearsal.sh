#!/usr/bin/env bash
# Chained post-rehearsal chip work (round 4): wait for the rehearsal
# process to exit (it owns the TPU tunnel until then), then
#   1. re-run the Pallas kernel suite on the chip — the 10:24 run's four
#      dropout-kernel failures predate the int32-compare fix (57d9d7f),
#   2. drain the round4g queue (train-memory levers, GCN scan sweep, KGE
#      marginal eval, int8 re-measure, final headline bench).
# The wait is bounded by the rehearsal's own REHEARSAL_BUDGET timeout.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=${OUT:-/root/bench_r4}
PIDFILE=${PIDFILE:-/tmp/rehearsal.pid}
mkdir -p "$OUT"

if [ -f "$PIDFILE" ]; then
  pid=$(cat "$PIDFILE")
  while kill -0 "$pid" 2>/dev/null; do sleep 30; done
fi
echo "=== [r4h] rehearsal drained @ $(date +%s) ===" | tee -a "$OUT/queue.log"

echo "=== [r4h] kernel_suite_rerun @ $(date +%s) ===" | tee -a "$OUT/queue.log"
# NB append to PYTHONPATH — overwriting it drops /root/.axon_site, the
# sitecustomize that registers the TPU plugin, and the suite silently
# skips on CPU ("needs real TPU")
timeout 1500 env IA_TPU_TESTS=1 PYTHONPATH=/root/repo:${PYTHONPATH:-} python -m pytest \
  tests/test_pallas_kernel_tpu.py -q > "$OUT/kernel_suite_rerun.log" 2>&1
echo "=== [r4h] kernel_suite_rerun rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"

exec bash scripts/round4g_queue.sh
