#!/usr/bin/env bash
# Round-3 A/B queue: waits for round3c, then measures the fused-QKV
# projection (one [H, 3H] matmul vs three [H, H]; cfg.fuse_qkv) on the
# flagship train step and the batch the r3b sweep found best.
#
#   DEADLINE=<unix_s> bash scripts/round3d_queue.sh
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${OUT:-/root/bench_r3}
DEADLINE=${DEADLINE:-0}
mkdir -p "$OUT"

echo "waiting for round3c marker ..."
while ! grep -q "\[r3c\] queue complete" "$OUT/queue.log" 2>/dev/null; do
  sleep 60
done
echo "round3c done; round3d begins @ $(date +%s)" | tee -a "$OUT/queue.log"

left() { echo $((DEADLINE - $(date +%s))); }
run() {
  local name=$1 t=$2; shift 2
  if [ "$DEADLINE" != 0 ]; then
    local l; l=$(left)
    if [ "$l" -lt 180 ]; then
      echo "=== [r3d] $name SKIPPED (deadline) @ $(date +%s) ===" | tee -a "$OUT/queue.log"
      return
    fi
    [ "$l" -lt "$t" ] && t=$l
  fi
  echo "=== [r3d] $name @ $(date +%s) ===" | tee -a "$OUT/queue.log"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "=== [r3d] $name rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"
}

run train_bs16_fuseqkv 1500 python benchmarks/bench_train.py \
  --batch_size 16 --fuse_qkv
run train_bs32_fuseqkv 1500 python benchmarks/bench_train.py \
  --batch_size 32 --fuse_qkv
run train_bs64_fuseqkv 1800 python benchmarks/bench_train.py \
  --batch_size 64 --fuse_qkv
echo "=== [r3d] queue complete @ $(date +%s) ===" | tee -a "$OUT/queue.log"
