#!/usr/bin/env bash
# Round-3 train-MFU diagnosis queue: waits for round3e (rehearsal v2 +
# r3c/r3d tails), then isolates why the train step is batch-flat at ~48%
# MFU while no-dropout inference reaches 64%:
#   - fwd/bwd/opt breakdown at bs16 and bs32 (the bs32 row OOMed before
#     bench_train.py freed the optimizer state between probes)
#   - --no_dropout A/B: quantifies the full dropout cost (rbg hidden
#     streams + in-kernel attention draws) at the same shapes
#   - bs64 --remat retry (first attempt died on a relay HTTP 500)
#
#   DEADLINE=<unix_s> bash scripts/round3f_queue.sh
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${OUT:-/root/bench_r3}
DEADLINE=${DEADLINE:-0}
mkdir -p "$OUT"

echo "waiting for round3e marker ..."
while ! grep -q "\[r3e\] queue complete" "$OUT/queue.log" 2>/dev/null; do
  sleep 60
done
echo "round3e done; round3f begins @ $(date +%s)" | tee -a "$OUT/queue.log"

left() { echo $((DEADLINE - $(date +%s))); }
run() {
  local name=$1 t=$2; shift 2
  if [ "$DEADLINE" != 0 ]; then
    local l; l=$(left)
    if [ "$l" -lt 180 ]; then
      echo "=== [r3f] $name SKIPPED (deadline) @ $(date +%s) ===" | tee -a "$OUT/queue.log"
      return
    fi
    [ "$l" -lt "$t" ] && t=$l
  fi
  echo "=== [r3f] $name @ $(date +%s) ===" | tee -a "$OUT/queue.log"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "=== [r3f] $name rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"
}

run train_bs16_nodropout 1500 python benchmarks/bench_train.py \
  --batch_size 16 --no_dropout
run train_bs16_breakdown2 1800 python benchmarks/bench_train.py \
  --batch_size 16 --breakdown
run train_bs16_nodropout_breakdown 1800 python benchmarks/bench_train.py \
  --batch_size 16 --no_dropout --breakdown
run train_bs32_nodropout 1500 python benchmarks/bench_train.py \
  --batch_size 32 --no_dropout
run train_bs32_breakdown2 1800 python benchmarks/bench_train.py \
  --batch_size 32 --breakdown
# "dots" at bs64 keeps every [64, 512, 4096] MLP intermediate resident
# (measured 19.28G vs 15.75G HBM, /root/bench_r3/train_bs64_remat.log);
# "full" saves only layer inputs and fits
run train_bs64_remat_retry 2400 python benchmarks/bench_train.py \
  --batch_size 64 --remat --remat_policy full
echo "=== [r3f] queue complete @ $(date +%s) ===" | tee -a "$OUT/queue.log"
