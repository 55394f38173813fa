#!/usr/bin/env bash
# Round-4 MFU diagnostics: split the train-forward gap (dropout vs batch vs
# attention kernel) before deciding the next optimization.  ~15 min chip.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=${OUT:-/root/bench_r4}
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$OUT/xla_cache}

run() {
  local name=$1 t=$2; shift 2
  echo "=== [r4diag] $name @ $(date +%s) ===" | tee -a "$OUT/queue.log"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "=== [r4diag] $name rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"
}

run fwd_split 1500 python benchmarks/bench_fwd_split.py
run attn_kernel_b16 600 python benchmarks/bench_attention.py --batch 16
run attn_kernel_b16_drop 600 python benchmarks/bench_attention.py \
  --batch 16 --dropout

echo "=== [r4diag] complete @ $(date +%s) ===" | tee -a "$OUT/queue.log"
