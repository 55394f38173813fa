#!/usr/bin/env bash
# Round-4 session-3 queue, part 1: the short jobs (train A/B + headline).
# The rehearsal + long tail run separately (round4d) so an MFU experiment
# can slot in between without pausing a monolithic queue.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=${OUT:-/root/bench_r4}
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$OUT/xla_cache}

run() {
  local name=$1 t=$2; shift 2
  echo "=== [r4c] $name @ $(date +%s) ===" | tee -a "$OUT/queue.log"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "=== [r4c] $name rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"
}

run train_bs16_no_dropout 1200 python benchmarks/bench_train.py \
  --batch_size 16 --no_dropout
run train_bs32 1200 python benchmarks/bench_train.py --batch_size 32
run train_bs16_breakdown 1200 python benchmarks/bench_train.py \
  --batch_size 16 --breakdown
run bench_headline 1800 python bench.py

echo "=== [r4c] part1 complete @ $(date +%s) ===" | tee -a "$OUT/queue.log"
