#!/usr/bin/env bash
# Round-4 master chip schedule. Order:
#   A. on-chip kernel suite  — validates the new 8-bit dropout draws
#      BEFORE anything trains with them
#   B. train-step A/B        — the VERDICT r3 #1 gate (>=110 pairs/s)
#   C. composed rehearsal    — train.sh + predict.sh end-to-end, ALL
#      members + category-aware ensemble + result.zip in one pass
#      (VERDICT r3 #2; the r3 run lost nfnet+bert to a tunnel outage)
#   D. headline bench        — with the perf regression gate
#   E. long tail             — GCN full-scale scan-layers sweep, KGE
#      marginal eval rate, int8 re-measure after the shared-QKV quant
#
#   DEADLINE=$(( $(date +%s) + 37800 )) bash scripts/round4_master.sh
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=${OUT:-/root/bench_r4}
DEADLINE=${DEADLINE:-0}
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$OUT/xla_cache}

left() { echo $((DEADLINE - $(date +%s))); }
run() {
  local name=$1 t=$2; shift 2
  if [ "$DEADLINE" != 0 ]; then
    local l; l=$(left)
    if [ "$l" -lt 120 ]; then
      echo "=== [r4] $name SKIPPED (deadline) @ $(date +%s) ===" | tee -a "$OUT/queue.log"
      return
    fi
    if [ "$l" -lt "$t" ]; then
      echo "=== [r4] $name CLIPPED to ${l}s (deadline) ===" | tee -a "$OUT/queue.log"
      t=$l
    fi
  fi
  echo "=== [r4] $name @ $(date +%s) ===" | tee -a "$OUT/queue.log"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "=== [r4] $name rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"
}

# A. kernel numerics on the chip (validates the 8-bit dropout rewrite)
run kernel_suite 2400 env IA_TPU_TESTS=1 python -m pytest \
  tests/test_pallas_kernel_tpu.py -q --no-header -p no:cacheprovider

# B. train-step A/B: the VERDICT r3 #1 gate (>=110 pairs/s @ dropout on)
run train_bs16 1200 python benchmarks/bench_train.py --batch_size 16
run train_bs16_breakdown 900 python benchmarks/bench_train.py \
  --batch_size 16 --breakdown
run train_bs16_no_dropout 900 python benchmarks/bench_train.py \
  --batch_size 16 --no_dropout
run train_bs32 900 python benchmarks/bench_train.py --batch_size 32

# C. composed rehearsal: the full train.sh + predict.sh pipeline, one pass
# (budget 7h; per-step marks stream into $DATA_DIR/train_log.txt)
run rehearsal 25200 env DATA_DIR=/root/rehearsal \
  JAX_COMPILATION_CACHE_DIR="$OUT/xla_cache" \
  bash scripts/rehearsal.sh

# D. headline bench (with the regression gate)
run bench_headline 1800 python bench.py

# E. long tail
run gcn_scan_256k 3000 python benchmarks/bench_gcn.py --train \
  --scan_layers --edge_chunk 262144 --compilation_cache_dir "$OUT/xla_cache"
run gcn_scan_128k 3000 python benchmarks/bench_gcn.py --train \
  --scan_layers --edge_chunk 131072 --compilation_cache_dir "$OUT/xla_cache"
run kge_eval_marginal 1800 python benchmarks/bench_kge.py --epochs 1 \
  --eval_triples 2048 --eval_marginal
run int8_cross_encoder 900 python benchmarks/bench_cross_encoder.py --quant int8
run int8_cross_encoder_bf16 900 python benchmarks/bench_cross_encoder.py

echo "=== [r4] queue complete @ $(date +%s) ===" | tee -a "$OUT/queue.log"
