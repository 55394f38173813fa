#!/usr/bin/env bash
# Dress rehearsal: run the REAL scripts/train.sh + scripts/predict.sh as one
# orchestrated pipeline on a reference-shaped synthetic corpus (65k train
# pairs, ~258k KG entities / ~3M triples), at reduced epochs, and record the
# measured per-step wall-clock (VERDICT r2 "Next round" #1).
#
#   DATA_DIR=/root/rehearsal bash scripts/rehearsal.sh
#
# Defaults: 1 epoch per finetune member, 50 KGE epochs (vs the reference's
# 10/500); the per-step seconds scale linearly to the full schedule.  The
# corpus is synthetic (no CCKS data or pretrained RoBERTa weights exist in
# this image) so this measures pipeline integrity + wall-clock, not F1
# parity; image members run on the --n_image_pairs slice and extrapolate.
set -uo pipefail

DATA_DIR=${DATA_DIR:-/root/rehearsal_data}
export DATA_DIR
export IA=${IA:-"python -m item_alignment_tpu.cli"}
export EPOCHS=${EPOCHS:-1}
export KGE_EPOCHS=${KGE_EPOCHS:-50}
export BERT_EPOCHS=${BERT_EPOCHS:-1}
cd "$(dirname "$0")/.."
mkdir -p "$DATA_DIR"
# persistent XLA compile cache: predict.sh reuses train.sh's compiles, and
# a completed reference-scale GCN compile survives across attempts
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$DATA_DIR/xla_cache}

if [ ! -f "$DATA_DIR/raw/item_info.jsonl" ]; then
  echo "=== [rehearsal] corpus generation @ $(date +%s) ==="
  python scripts/make_synth_corpus.py --output_dir "$DATA_DIR" \
    --with_nfnet_ckpt ${CORPUS_FLAGS:-}
fi

echo "=== [rehearsal] train.sh begin @ $(date +%s) ==="
bash scripts/train.sh 2>&1 | tee "$DATA_DIR/train_log.txt"
train_rc=${PIPESTATUS[0]}
echo "=== [rehearsal] train.sh end rc=$train_rc @ $(date +%s) ==="

echo "=== [rehearsal] predict.sh begin @ $(date +%s) ==="
bash scripts/predict.sh 2>&1 | tee "$DATA_DIR/predict_log.txt"
pred_rc=${PIPESTATUS[0]}
echo "=== [rehearsal] predict.sh end rc=$pred_rc @ $(date +%s) ==="

python - "$DATA_DIR" <<'EOF'
import json
import re
import sys

data_dir = sys.argv[1]
rows = []
for log in ("train_log.txt", "predict_log.txt"):
    try:
        text = open(f"{data_dir}/{log}").read()
    except FileNotFoundError:
        continue
    marks = re.findall(r"=== \[(?:train|predict).sh\] step (\S+) @ (\d+) ===",
                       text)
    for (name, t0), (_, t1) in zip(marks, marks[1:]):
        rows.append({"step": name, "seconds": int(t1) - int(t0)})
print(json.dumps({"per_step_seconds": rows}, indent=1))
open(f"{data_dir}/rehearsal_steps.json", "w").write(json.dumps(rows))
EOF
exit $(( train_rc || pred_rc ))
