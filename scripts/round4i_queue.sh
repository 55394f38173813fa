#!/usr/bin/env bash
# Round-4 follow-on chip chain: waits for the running r4g queue to drain,
# then (1) probes the RECIPE batch 40 with the blessed levers, (2) re-runs
# the Pallas kernel suite on the chip (with the PYTHONPATH-append fix —
# the 22:27 run silently skipped on CPU), (3) backfills any r4g jobs the
# session deadline skipped, (4) GCN full-scale scan sweep, and finally
# (5) relaunches the full dress rehearsal (train.sh now carries bf16
# AdamW moments on the flagship) so a later session can harvest it.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=${OUT:-/root/bench_r4}
WAIT_PID=${WAIT_PID:-}
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$OUT/xla_cache}

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
echo "=== [r4i] start @ $(date +%s) ===" | tee -a "$OUT/queue.log"

run() {
  local name=$1 t=$2; shift 2
  if [ -s "$OUT/$name.log" ] && grep -q '^{' "$OUT/$name.log"; then
    echo "=== [r4i] $name CACHED (already has a JSON line) ===" | tee -a "$OUT/queue.log"
    return
  fi
  echo "=== [r4i] $name @ $(date +%s) ===" | tee -a "$OUT/queue.log"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "=== [r4i] $name rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"
}

# the recipe batch (train.sh uses --train_batch_size 40)
run train_bs40_replay 1200 python benchmarks/bench_train.py --batch_size 40 \
  --opt_state_dtype bfloat16

# kernel suite on the real chip (PYTHONPATH appended, not overwritten)
echo "=== [r4i] kernel_suite @ $(date +%s) ===" | tee -a "$OUT/queue.log"
timeout 1500 env IA_TPU_TESTS=1 python -m pytest \
  tests/test_pallas_kernel_tpu.py -q > "$OUT/kernel_suite_r4i.log" 2>&1
echo "=== [r4i] kernel_suite rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"

# backfill r4g jobs a session deadline may have skipped (run() skips any
# that already produced a JSON line)
run bench_headline 1800 python bench.py
run int8_cross_encoder 900 python benchmarks/bench_cross_encoder.py --quant int8
run bf16_cross_encoder 900 python benchmarks/bench_cross_encoder.py
run kge_eval_marginal 1800 python benchmarks/bench_kge.py --epochs 1 \
  --eval_triples 2048 --eval_marginal

# GCN full-scale on-chip (VERDICT r3 #5)
run gcn_scan_256k 3600 python benchmarks/bench_gcn.py --train \
  --scan_layers --edge_chunk 262144 --compilation_cache_dir "$OUT/xla_cache"
run gcn_scan_128k 3600 python benchmarks/bench_gcn.py --train \
  --scan_layers --edge_chunk 131072 --compilation_cache_dir "$OUT/xla_cache"

# full dress rehearsal: train.sh all 10 steps + predict.sh all 8 members +
# ensemble + result.zip (VERDICT r3 #2).  rehearsal.sh manages its own
# budget/resume marks; logs under /root/rehearsal.
echo "=== [r4i] rehearsal launch @ $(date +%s) ===" | tee -a "$OUT/queue.log"
timeout "${REHEARSAL_BUDGET:-21600}" bash scripts/rehearsal.sh \
  > "$OUT/rehearsal_r4i.log" 2>&1
echo "=== [r4i] rehearsal rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"
echo "=== [r4i] complete @ $(date +%s) ===" | tee -a "$OUT/queue.log"
