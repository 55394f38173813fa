#!/usr/bin/env bash
# Round-3 follow-up queue: waits for round3b_queue.sh to finish (its
# "queue complete" marker in $OUT/queue.log), then measures what this
# session changed:
#   1. attention kernel rows at the train shape — quantifies the cost of
#      restoring the exact softmax row max (the Cauchy-Schwarz shift was
#      retired for silently zeroing large-norm rows; see
#      ops/pallas_attention.py) against the r2 bound-shift numbers
#   2. blocked flash rows at S=2048 (the S>512 path got online max)
#   3. rehearsal step 4 re-measure at the corrected per-dispatch batch 64
#      (optax.MultiSteps had been accumulating 4 FULL 256-row dispatches)
#
#   DEADLINE=<unix_s> bash scripts/round3c_queue.sh
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${OUT:-/root/bench_r3}
DEADLINE=${DEADLINE:-0}
DATA_DIR=${DATA_DIR:-/root/rehearsal}
mkdir -p "$OUT"

echo "waiting for round3b 'queue complete' marker ..."
# match round3b's OWN marker: other queue scripts (and this one) append
# generic "queue complete" lines to the same shared log
while ! grep -q "\[r3b\] queue complete" "$OUT/queue.log" 2>/dev/null; do
  sleep 60
done
echo "round3b done; round3c begins @ $(date +%s)" | tee -a "$OUT/queue.log"

left() { echo $((DEADLINE - $(date +%s))); }
run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  if [ "$DEADLINE" != 0 ]; then
    local l; l=$(left)
    if [ "$l" -lt 180 ]; then
      echo "=== [r3c] $name SKIPPED (deadline) @ $(date +%s) ===" | tee -a "$OUT/queue.log"
      return
    fi
    [ "$l" -lt "$t" ] && t=$l
  fi
  echo "=== [r3c] $name @ $(date +%s) ===" | tee -a "$OUT/queue.log"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "=== [r3c] $name rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"
}

# 1. exact-max kernel cost at the flagship train shape
run attn_fwd_bwd 1500 python benchmarks/bench_attention.py --batch 16
run attn_dropout 1500 python benchmarks/bench_attention.py --batch 16 --dropout
# 2. blocked flash with online max, long-context shape
run attn_blockwise_s2048 1800 python benchmarks/bench_attention.py \
  --batch 4 --seq 2048 --blockwise
run attn_blockwise_s2048_dropout 1800 python benchmarks/bench_attention.py \
  --batch 4 --seq 2048 --blockwise --dropout
# 3. rehearsal step 4 at the corrected effective-batch-256 schedule
if [ "$DEADLINE" = 0 ] || [ "$(left)" -gt 2400 ]; then
  echo "=== [r3c] step4-remeasure @ $(date +%s) ===" | tee -a "$OUT/queue.log"
  DATA_DIR="$DATA_DIR" OUT="$DATA_DIR/output" START_AT=4 STOP_AFTER=4 \
    EPOCHS=1 KGE_EPOCHS=50 BERT_EPOCHS=1 \
    IA="python -m item_alignment_tpu.cli" \
    JAX_COMPILATION_CACHE_DIR="$DATA_DIR/xla_cache" \
    timeout 3600 bash scripts/train.sh \
    >> "$DATA_DIR/train_log_part4.txt" 2>&1
  echo "=== [r3c] step4-remeasure rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"
fi
echo "=== [r3c] queue complete @ $(date +%s) ===" | tee -a "$OUT/queue.log"
