#!/usr/bin/env bash
# Round-3 continuation queue (after the tunnel outage): waits for the TPU
# to come back (/tmp/tpu_up written by a probe loop), then runs the
# remaining validation + measurement items sequentially, most important
# first (one TPU process at a time — the remote tunnel serializes
# compiles).  Results land in $OUT; pipeline artifacts in $DATA_DIR.
#
# Order rationale: kernel validation gates pred-bert; the bench_train
# sweep rows are short and carry VERDICT r2 #2's explicit ">=120 pairs/s"
# bar, so they run before the long pipeline steps in case the tunnel
# window is short.
#
#   DEADLINE=<unix_s> bash scripts/round3b_queue.sh
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${OUT:-/root/bench_r3}
DEADLINE=${DEADLINE:-0}
DATA_DIR=${DATA_DIR:-/root/rehearsal}
mkdir -p "$OUT"

if [ ! -e /tmp/tpu_up ]; then
  echo "waiting for /tmp/tpu_up ..."
  while [ ! -e /tmp/tpu_up ]; do sleep 30; done
fi
echo "TPU up; queue begins @ $(date +%s)" | tee -a "$OUT/queue.log"

left() { echo $((DEADLINE - $(date +%s))); }
run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  if [ "$DEADLINE" != 0 ]; then
    local l; l=$(left)
    if [ "$l" -lt 180 ]; then
      echo "=== [r3b] $name SKIPPED (deadline) @ $(date +%s) ===" | tee -a "$OUT/queue.log"
      return
    fi
    [ "$l" -lt "$t" ] && t=$l
  fi
  echo "=== [r3b] $name @ $(date +%s) ===" | tee -a "$OUT/queue.log"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "=== [r3b] $name rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"
}

# 1. hardware-gate the Pallas kernels, incl. the new 12-head (group-6)
#    paths pred-bert now routes through (commit 96c2919); Mosaic compile
#    failures escape the call-time fallback, so validate BEFORE p6-bert
run tpu_kernel_tests 3000 env IA_TPU_TESTS=1 \
  python -m pytest tests/test_pallas_kernel_tpu.py -q

# 2. batch sweep toward the >=120 pairs/s bar (VERDICT r2 #2; bs16 is
#    flat at ~96) — short rows, run them before the long pipeline steps
run train_bs32 1800 python benchmarks/bench_train.py --batch_size 32
run train_bs64 2400 python benchmarks/bench_train.py --batch_size 64
run train_bs64_remat 2400 python benchmarks/bench_train.py --batch_size 64 --remat
run train_bs32_breakdown 1500 python benchmarks/bench_train.py --batch_size 32 --breakdown

# 3. predict tail: nfnet (p5) + legacy bert (p6) members, then the full
#    7-member ensemble + validated result.zip (last session packaged 5)
export IA="python -m item_alignment_tpu.cli" EPOCHS=1 KGE_EPOCHS=50 BERT_EPOCHS=1
export JAX_COMPILATION_CACHE_DIR="$DATA_DIR/xla_cache"
if [ "$DEADLINE" = 0 ] || [ "$(left)" -gt 2400 ]; then
  echo "=== [r3b] predict-tail @ $(date +%s) ===" | tee -a "$OUT/queue.log"
  START_AT=p5 timeout 4800 bash scripts/predict.sh \
    >> "$DATA_DIR/predict_log_part3.txt" 2>&1
  echo "=== [r3b] predict-tail rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"
fi

# 4. finish the rehearsal pipeline: step 9 (GCN: pred-text encode +
#    finetune-graph) died on the relay outage last session
if [ "$DEADLINE" = 0 ] || [ "$(left)" -gt 2400 ]; then
  echo "=== [r3b] step9-rerun @ $(date +%s) ===" | tee -a "$OUT/queue.log"
  START_AT=9 timeout 3600 bash scripts/train.sh \
    >> "$DATA_DIR/train_log_part3.txt" 2>&1
  echo "=== [r3b] step9-rerun rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"
fi

# 5. KGE link-prediction eval at reference scale (VERDICT r2 #5)
run kge_eval 2400 python benchmarks/bench_kge.py --epochs 2 --eval_triples 2000
# 6. image MFU accounting (VERDICT r2 #8): fwd all three towers + nfnet train
run image_mfu_nfnet 2400 python benchmarks/bench_image.py --model eca_nfnet_l0
run image_mfu_vit 1800 python benchmarks/bench_image.py --model vit_base_patch16_384
run image_mfu_resnet 1800 python benchmarks/bench_image.py --model resnetv2_50
run image_mfu_nfnet_train 2400 python benchmarks/bench_image.py --model eca_nfnet_l0 --train
# 7. GCN full-scale AOT attempt through the persistent cache (VERDICT r2 #7)
run gcn_aot_compile 3600 python benchmarks/bench_gcn.py --train \
  --edge_chunk 262144 --compile_only \
  --compilation_cache_dir "$DATA_DIR/xla_cache"
# 8. int8 serving path (new this round): dense projections on the int8
#    MXU (2x bf16 peak); sweep the batch since the sweet spot may shift
run cross_encoder_int8 1800 python benchmarks/bench_cross_encoder.py --quant int8
run cross_encoder_int8_bs128 1500 python benchmarks/bench_cross_encoder.py \
  --quant int8 --batch_size 128
run image_mfu_vit_int8 1500 python benchmarks/bench_image.py \
  --model vit_base_patch16_384 --quant int8
# 9. headline refresh
run bench_main 2400 python bench.py
echo "=== [r3b] queue complete @ $(date +%s) ===" | tee -a "$OUT/queue.log"
