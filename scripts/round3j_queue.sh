#!/usr/bin/env bash
# Round-3 session-5 re-measure queue: the container recycle between
# sessions wiped /root/bench_r3 before the r3f/r3g/r3h results could be
# committed, so this queue re-runs the highest-value lost rows directly
# (no marker-waiting -- the session serializes chip access itself):
#   1. train-MFU sweep (VERDICT r2 #2): bs32 breakdown, bs32+fused-qkv,
#      bs64 remat=full retry
#   2. KGE link-prediction eval at reference scale (VERDICT r2 #5)
#
#   DEADLINE=<unix_s> bash scripts/round3j_queue.sh
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${OUT:-/tmp/bench_r3j}
DEADLINE=${DEADLINE:-0}
mkdir -p "$OUT"

left() { echo $((DEADLINE - $(date +%s))); }
run() {
  local name=$1 t=$2; shift 2
  if [ "$DEADLINE" != 0 ]; then
    local l; l=$(left)
    if [ "$l" -lt 120 ]; then
      echo "=== [r3j] $name SKIPPED (deadline) @ $(date +%s) ===" | tee -a "$OUT/queue.log"
      return
    fi
    [ "$l" -lt "$t" ] && t=$l
  fi
  echo "=== [r3j] $name @ $(date +%s) ===" | tee -a "$OUT/queue.log"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "=== [r3j] $name rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"
}

run train_bs32_breakdown 900 python benchmarks/bench_train.py \
  --batch_size 32 --breakdown
run train_bs32_fuseqkv 700 python benchmarks/bench_train.py \
  --batch_size 32 --fuse_qkv
run train_bs64_remat_full 900 python benchmarks/bench_train.py \
  --batch_size 64 --remat --remat_policy full
run kge_eval 1200 python benchmarks/bench_kge.py --epochs 1 \
  --eval_triples 1024
run train_bs16_fuseqkv 700 python benchmarks/bench_train.py \
  --batch_size 16 --fuse_qkv
echo "=== [r3j] queue complete @ $(date +%s) ===" | tee -a "$OUT/queue.log"
