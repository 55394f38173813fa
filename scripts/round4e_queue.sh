#!/usr/bin/env bash
# Round-4 session-4 MFU A/B: replay dropout (bs16) + the 'mlp' remat policy
# batch lever (bs32/bs64).  ~45 min chip.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=${OUT:-/root/bench_r4}
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$OUT/xla_cache}

run() {
  local name=$1 t=$2; shift 2
  echo "=== [r4e] $name @ $(date +%s) ===" | tee -a "$OUT/queue.log"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "=== [r4e] $name rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"
}

run train_bs16_replay 900 python benchmarks/bench_train.py --batch_size 16
run train_bs16_replay_breakdown 900 python benchmarks/bench_train.py \
  --batch_size 16 --breakdown
run train_bs32_mlp 900 python benchmarks/bench_train.py --batch_size 32 \
  --remat --remat_policy mlp
run train_bs64_mlp 1200 python benchmarks/bench_train.py --batch_size 64 \
  --remat --remat_policy mlp
echo "=== [r4e] complete @ $(date +%s) ===" | tee -a "$OUT/queue.log"
