#!/usr/bin/env bash
# Round-4 post-rehearsal long tail: train-step probes for the two new
# memory levers, the GCN full-scale scan-layer sweep, the KGE marginal
# eval rate, the int8 re-measure, and the final headline bench.
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
      echo "=== [r4g] $name SKIPPED (deadline) @ $(date +%s) ===" | tee -a "$OUT/queue.log"
      return
    fi
    if [ "$l" -lt "$t" ]; then
      echo "=== [r4g] $name CLIPPED to ${l}s (deadline) ===" | tee -a "$OUT/queue.log"
      t=$l
    fi
  fi
  echo "=== [r4g] $name @ $(date +%s) ===" | tee -a "$OUT/queue.log"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "=== [r4g] $name rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"
}

# train probes: bf16 opt state; bs32/bs24 plain retests with the freed
# memory (replay dropout killed the mask residuals)
run train_bs16_bf16opt 900 python benchmarks/bench_train.py \
  --batch_size 16 --opt_state_dtype bfloat16
run train_bs32_replay 900 python benchmarks/bench_train.py --batch_size 32 \
  --opt_state_dtype bfloat16
run train_bs24_replay 900 python benchmarks/bench_train.py --batch_size 24 \
  --opt_state_dtype bfloat16
run train_bs48_replay 900 python benchmarks/bench_train.py --batch_size 48 \
  --opt_state_dtype bfloat16

# final headline (regression gate vs BENCH_r03) — run EARLY so a short
# session deadline never starves the number the round is judged on
run bench_headline 1800 python bench.py

# int8 re-measure after the shared-QKV quant (VERDICT r3 #7)
run int8_cross_encoder 900 python benchmarks/bench_cross_encoder.py --quant int8
run bf16_cross_encoder 900 python benchmarks/bench_cross_encoder.py

# KGE marginal eval rate (ADVICE r3: measure, not estimate)
run kge_eval_marginal 1800 python benchmarks/bench_kge.py --epochs 1 \
  --eval_triples 2048 --eval_marginal

# GCN full-scale on-chip (VERDICT r3 #5): scanned layers shrink the compile.
# SKIP_GCN=1 skips these ~50-min compiles when the session can't fit them.
if [ "${SKIP_GCN:-0}" != 1 ]; then
  run gcn_scan_256k 3000 python benchmarks/bench_gcn.py --train \
    --scan_layers --edge_chunk 262144 --compilation_cache_dir "$OUT/xla_cache"
  run gcn_scan_128k 3000 python benchmarks/bench_gcn.py --train \
    --scan_layers --edge_chunk 131072 --compilation_cache_dir "$OUT/xla_cache"
fi
echo "=== [r4g] complete @ $(date +%s) ===" | tee -a "$OUT/queue.log"
