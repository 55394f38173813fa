#!/usr/bin/env bash
# Round-4 resume queue (session 2).  The round4_master.sh run validated the
# 8-bit dropout draws on chip (kernel_suite caught the vector<i8> cmpi
# Mosaic rejection; the int32-widen fix passed all 7 dropout tests in
# dropout_fix_check.log) but died at train_bs16.  Resume order:
#   B. train-step A/B      — VERDICT r3 #1 gate (>=110 pairs/s, dropout on)
#   D. headline bench      — with the perf regression gate
#   C. composed rehearsal  — train.sh + predict.sh, ALL members + ensemble
#   E. long tail           — GCN scan sweep, KGE marginal, int8 re-measure
#
#   DEADLINE=$(( $(date +%s) + 36000 )) bash scripts/round4b_queue.sh
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
      echo "=== [r4b] $name SKIPPED (deadline) @ $(date +%s) ===" | tee -a "$OUT/queue.log"
      return
    fi
    if [ "$l" -lt "$t" ]; then
      echo "=== [r4b] $name CLIPPED to ${l}s (deadline) ===" | tee -a "$OUT/queue.log"
      t=$l
    fi
  fi
  echo "=== [r4b] $name @ $(date +%s) ===" | tee -a "$OUT/queue.log"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "=== [r4b] $name rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"
}

# B. train-step A/B: the VERDICT r3 #1 gate (>=110 pairs/s @ dropout on)
run train_bs16 1500 python benchmarks/bench_train.py --batch_size 16
run train_bs16_no_dropout 900 python benchmarks/bench_train.py \
  --batch_size 16 --no_dropout
run train_bs32 900 python benchmarks/bench_train.py --batch_size 32
run train_bs16_breakdown 900 python benchmarks/bench_train.py \
  --batch_size 16 --breakdown

# D. headline bench (with the regression gate) — run BEFORE the long
# rehearsal so a round-end cutoff still leaves a fresh headline number
run bench_headline 1800 python bench.py

# C. composed rehearsal: the full train.sh + predict.sh pipeline, one pass
run rehearsal 23000 env DATA_DIR=/root/rehearsal \
  JAX_COMPILATION_CACHE_DIR="$OUT/xla_cache" \
  bash scripts/rehearsal.sh

# E. long tail
run gcn_scan_256k 3000 python benchmarks/bench_gcn.py --train \
  --scan_layers --edge_chunk 262144 --compilation_cache_dir "$OUT/xla_cache"
run gcn_scan_128k 3000 python benchmarks/bench_gcn.py --train \
  --scan_layers --edge_chunk 131072 --compilation_cache_dir "$OUT/xla_cache"
run kge_eval_marginal 1800 python benchmarks/bench_kge.py --epochs 1 \
  --eval_triples 2048 --eval_marginal
run int8_cross_encoder 900 python benchmarks/bench_cross_encoder.py --quant int8
run int8_cross_encoder_bf16 900 python benchmarks/bench_cross_encoder.py

echo "=== [r4b] queue complete @ $(date +%s) ===" | tee -a "$OUT/queue.log"
