#!/usr/bin/env bash
# Round-3 image-MFU redo queue: waits for round3f, then re-measures the
# image towers with the corrected bench (distinct src/tgt images — the
# old rows let XLA CSE the second tower away — and exact jaxpr-traced
# FLOPs instead of the remote backend's under-reporting cost_analysis),
# sweeps the NFNet batch, and retries the two relay-500 casualties
# (KGE link-prediction eval at reference scale, ViT int8 row).
#
#   DEADLINE=<unix_s> bash scripts/round3g_queue.sh
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${OUT:-/root/bench_r3}
DEADLINE=${DEADLINE:-0}
mkdir -p "$OUT"

echo "waiting for round3f marker ..."
while ! grep -q "\[r3f\] queue complete" "$OUT/queue.log" 2>/dev/null; do
  sleep 60
done
echo "round3f done; round3g begins @ $(date +%s)" | tee -a "$OUT/queue.log"

left() { echo $((DEADLINE - $(date +%s))); }
run() {
  local name=$1 t=$2; shift 2
  if [ "$DEADLINE" != 0 ]; then
    local l; l=$(left)
    if [ "$l" -lt 180 ]; then
      echo "=== [r3g] $name SKIPPED (deadline) @ $(date +%s) ===" | tee -a "$OUT/queue.log"
      return
    fi
    [ "$l" -lt "$t" ] && t=$l
  fi
  echo "=== [r3g] $name @ $(date +%s) ===" | tee -a "$OUT/queue.log"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "=== [r3g] $name rc=$? @ $(date +%s) ===" | tee -a "$OUT/queue.log"
}

# relay-500 retry first: KGE link-prediction eval at reference scale is a
# VERDICT r2 "Done =" item; the deadline trims from the tail
run kge_eval_retry 2400 python benchmarks/bench_kge.py --epochs 2 \
  --eval_triples 2000
# corrected image rows (supersede the r3b image_mfu_* rows), one per tower
# first, then the sweeps
run img2_nfnet 1800 python benchmarks/bench_image.py --model eca_nfnet_l0
run img2_vit 1500 python benchmarks/bench_image.py --model vit_base_patch16_384
run img2_resnet 1500 python benchmarks/bench_image.py --model resnetv2_50
run img2_nfnet_train 2400 python benchmarks/bench_image.py \
  --model eca_nfnet_l0 --train
run img2_nfnet_bs16 1800 python benchmarks/bench_image.py \
  --model eca_nfnet_l0 --batch_size 16
run img2_nfnet_bs32 1800 python benchmarks/bench_image.py \
  --model eca_nfnet_l0 --batch_size 32
run img2_vit_bs64 1500 python benchmarks/bench_image.py \
  --model vit_base_patch16_384 --batch_size 64
run img2_vit_int8 1500 python benchmarks/bench_image.py \
  --model vit_base_patch16_384 --quant int8
echo "=== [r3g] queue complete @ $(date +%s) ===" | tee -a "$OUT/queue.log"
