#!/usr/bin/env bash
# Round-4 rehearsal relaunch: run from a SNAPSHOT CLONE of the repo at HEAD
# so concurrent development in /root/repo cannot break the 7h pipeline
# (the first r4 attempt died picking up a mid-edit tree), and with a clean
# env (no OUT leak into train.sh/predict.sh).
set -uo pipefail
OUT=${OUT:-/root/bench_r4}
SNAP=/root/rehearsal_repo
mkdir -p "$OUT"

rm -rf "$SNAP"
git clone -q /root/repo "$SNAP"
echo "snapshot at $(git -C "$SNAP" rev-parse --short HEAD)" | tee -a "$OUT/queue.log"

echo "=== [r4f] rehearsal @ $(date +%s) ===" | tee -a "$OUT/queue.log"
# steps 0 (prepare) + 1 (pkgm-pretrain) completed in the first r4 attempt
# and their artifacts live under DATA_DIR (not the leaked OUT) — resume at 2
timeout "${REHEARSAL_BUDGET:-25200}" env -u OUT \
  START_AT="${START_AT:-2}" \
  DATA_DIR=/root/rehearsal \
  PYTHONPATH="$SNAP:${PYTHONPATH:-}" \
  JAX_COMPILATION_CACHE_DIR="$OUT/xla_cache" \
  bash "$SNAP/scripts/rehearsal.sh" > "$OUT/rehearsal.log" 2>&1
echo "=== [r4f] rehearsal rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"
