#!/usr/bin/env bash
# Round-4 hardware measurement queue (runs after the rehearsal frees the
# chip).  Order: correctness first (kernel suite validates the new 8-bit
# dropout draws), then the train-MFU A/B the round is gated on, then the
# headline bench, then the long-tail items (GCN full-scale, KGE marginal,
# int8 re-measure).
#
#   OUT=/root/bench_r4 DEADLINE=$(( $(date +%s) + 14400 )) \
#     bash scripts/round4_queue.sh
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${OUT:-/root/bench_r4}
DEADLINE=${DEADLINE:-0}
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/bench_r4/xla_cache}

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

# 1. kernel numerics on the chip (validates the 8-bit dropout rewrite)
run kernel_suite 2400 env IA_TPU_TESTS=1 python -m pytest \
  tests/test_pallas_kernel_tpu.py -q --no-header -p no:cacheprovider

# 2. train-step A/B: the VERDICT r3 #1 gate (>=110 pairs/s @ dropout on)
run train_bs16 900 python benchmarks/bench_train.py --batch_size 16
run train_bs16_breakdown 900 python benchmarks/bench_train.py \
  --batch_size 16 --breakdown
run train_bs16_no_dropout 900 python benchmarks/bench_train.py \
  --batch_size 16 --no_dropout
run train_bs32 900 python benchmarks/bench_train.py --batch_size 32

# 3. headline bench (with the new regression gate)
run bench_headline 1800 python bench.py

# 4. GCN full-scale on-chip (VERDICT r3 #5): scanned layers through the
# persistent compile cache, edge_chunk sweep small->large so earlier
# compiles warm the cache
GCN_CACHE="$OUT/xla_cache"
run gcn_scan_256k 3000 python benchmarks/bench_gcn.py --train \
  --scan_layers --edge_chunk 262144 --compilation_cache_dir "$GCN_CACHE"
run gcn_scan_128k 3000 python benchmarks/bench_gcn.py --train \
  --scan_layers --edge_chunk 131072 --compilation_cache_dir "$GCN_CACHE"
run gcn_scan_64k 3000 python benchmarks/bench_gcn.py --train \
  --scan_layers --edge_chunk 65536 --compilation_cache_dir "$GCN_CACHE"

# 5. KGE eval marginal rate (ADVICE r3: measure, not infer)
run kge_eval_marginal 1800 python benchmarks/bench_kge.py --epochs 1 \
  --eval_triples 2048 --eval_marginal

# 6. int8 re-measure after the shared-QKV activation quant
run int8_cross_encoder 900 python benchmarks/bench_cross_encoder.py --quant int8
run int8_cross_encoder_bf16 900 python benchmarks/bench_cross_encoder.py

echo "=== [r4] queue complete @ $(date +%s) ===" | tee -a "$OUT/queue.log"
