#!/usr/bin/env bash
# Round-3 session-6 final chip queue (run after bench.py validation frees
# the chip):
#   1. KGE link-prediction eval at reference scale with the marginal
#      (post-compile) rate + full-3M-eval estimate (bench_kge.py now
#      times a second cache-hit pass)
#   2. train-forward dropout-cost A/B at bs 16 (the named residual
#      headroom in the COVERAGE train-MFU table)
#
#   DEADLINE=<unix_s> bash scripts/round3k_queue.sh
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${OUT:-/root/bench_r3k}
DEADLINE=${DEADLINE:-0}
mkdir -p "$OUT"

left() { echo $((DEADLINE - $(date +%s))); }
run() {
  local name=$1 t=$2; shift 2
  if [ "$DEADLINE" != 0 ]; then
    local l; l=$(left)
    if [ "$l" -lt 120 ]; then
      echo "=== [r3k] $name SKIPPED (deadline) @ $(date +%s) ===" | tee -a "$OUT/queue.log"
      return
    fi
    # a clipped timeout kills the job mid-run (rc=124) — log it so those
    # entries can be told apart from genuine hangs when summarizing
    if [ "$l" -lt "$t" ]; then
      echo "=== [r3k] $name CLIPPED to ${l}s (deadline) ===" | tee -a "$OUT/queue.log"
      t=$l
    fi
  fi
  echo "=== [r3k] $name @ $(date +%s) ===" | tee -a "$OUT/queue.log"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "=== [r3k] $name rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"
}

run kge_eval_marginal 1500 python benchmarks/bench_kge.py --epochs 1 \
  --eval_triples 2048 --eval_marginal
run train_bs16_no_dropout 700 python benchmarks/bench_train.py \
  --batch_size 16 --no_dropout
echo "=== [r3k] queue complete @ $(date +%s) ===" | tee -a "$OUT/queue.log"
