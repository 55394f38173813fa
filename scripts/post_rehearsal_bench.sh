#!/usr/bin/env bash
# Post-rehearsal TPU benchmark queue.  Waits for the dress rehearsal
# process to exit (one TPU process at a time — the remote tunnel
# serializes compiles), then runs the round-3 measurement queue
# sequentially, most important first.  Results land in /root/bench_r3/.
#
# DEADLINE (unix seconds): items are skipped once past it so the TPU is
# free when the round driver runs bench.py at round end.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${OUT:-/root/bench_r3}
DEADLINE=${DEADLINE:-0}
mkdir -p "$OUT"

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "waiting for rehearsal pid $WAIT_PID ..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "rehearsal done @ $(date +%s)"
fi

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  if [ "$DEADLINE" != 0 ] && [ "$(date +%s)" -gt "$DEADLINE" ]; then
    echo "=== [bench] $name SKIPPED (deadline) @ $(date +%s) ===" | tee -a "$OUT/queue.log"
    return
  fi
  if [ "$DEADLINE" != 0 ] && [ $((DEADLINE - $(date +%s))) -lt "$t" ]; then
    t=$((DEADLINE - $(date +%s)))
  fi
  echo "=== [bench] $name @ $(date +%s) ===" | tee -a "$OUT/queue.log"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "=== [bench] $name rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"
}

# 1. flagship train throughput + fwd/bwd/opt breakdown (VERDICT r2 #2)
run train_bs16_breakdown 2400 python benchmarks/bench_train.py --breakdown
# 2. KGE link-prediction eval at reference scale (VERDICT r2 #5)
run kge_eval 2400 python benchmarks/bench_kge.py --epochs 2 --eval_triples 2000
# 3. image towers with the new FLOPs/MFU accounting (VERDICT r2 #8)
run image_mfu 3600 python benchmarks/bench_image.py
# 4. batch sweep (VERDICT: "sweep bs 32/64 with remat_policy=dots")
run train_bs64 2400 python benchmarks/bench_train.py --batch_size 64
run train_bs32 1800 python benchmarks/bench_train.py --batch_size 32
run train_bs64_remat 2400 python benchmarks/bench_train.py --batch_size 64 --remat
# 5. attention kernel snapshot (post bound-shift)
run attn_fulltile 1200 python benchmarks/bench_attention.py --dropout
run attn_blockwise 1200 python benchmarks/bench_attention.py --blockwise --seq 2048 --dropout
# 6. headline metric refresh
run bench_main 2400 python bench.py
echo "=== [bench] queue complete @ $(date +%s) ===" | tee -a "$OUT/queue.log"
