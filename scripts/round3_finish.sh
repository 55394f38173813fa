#!/usr/bin/env bash
# Round-3 finishing sequence: after the dress rehearsal exits, run the
# highest-value TPU measurements and the step-9 (GCN) retry in priority
# order, stopping at DEADLINE so the chip is free for the round driver.
#
#   DEADLINE=<unix_s> bash scripts/round3_finish.sh <rehearsal_pid>
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${OUT:-/root/bench_r3}
DEADLINE=${DEADLINE:-0}
DATA_DIR=${DATA_DIR:-/root/rehearsal}
mkdir -p "$OUT"

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "waiting for rehearsal pid $WAIT_PID ..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "rehearsal done @ $(date +%s)"
fi

left() { echo $((DEADLINE - $(date +%s))); }
run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  if [ "$DEADLINE" != 0 ]; then
    local l; l=$(left)
    if [ "$l" -lt 180 ]; then
      echo "=== [finish] $name SKIPPED (deadline) @ $(date +%s) ===" | tee -a "$OUT/queue.log"
      return
    fi
    [ "$l" -lt "$t" ] && t=$l
  fi
  echo "=== [finish] $name @ $(date +%s) ===" | tee -a "$OUT/queue.log"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "=== [finish] $name rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"
}

# 1. flagship train throughput + fwd/bwd/opt split (VERDICT r2 #2)
run train_bs16_breakdown 1800 python benchmarks/bench_train.py --breakdown
# 2. finish the pipeline: step 9 (build-graph ran; pred-text died on a
#    relay flake) with the parallelized pred-text + transient retries
if [ "$DEADLINE" = 0 ] || [ "$(left)" -gt 900 ]; then
  echo "=== [finish] step9-rerun @ $(date +%s) ===" | tee -a "$OUT/queue.log"
  export IA="python -m item_alignment_tpu.cli" EPOCHS=1 KGE_EPOCHS=50 BERT_EPOCHS=1
  export JAX_COMPILATION_CACHE_DIR="$DATA_DIR/xla_cache"
  START_AT=9 timeout $(( $(left) > 3000 ? 3000 : $(left) )) \
    bash scripts/train.sh >> "$DATA_DIR/train_log_part3.txt" 2>&1
  echo "=== [finish] step9-rerun rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"
fi
# 3. KGE link-prediction eval at reference scale (VERDICT r2 #5)
run kge_eval 2400 python benchmarks/bench_kge.py --epochs 2 --eval_triples 2000
# 4. image MFU accounting (VERDICT r2 #8)
run image_mfu 2400 python benchmarks/bench_image.py
# 5. batch sweep
run train_bs64 1800 python benchmarks/bench_train.py --batch_size 64
run train_bs32 1500 python benchmarks/bench_train.py --batch_size 32
echo "=== [finish] done @ $(date +%s) ===" | tee -a "$OUT/queue.log"
