#!/usr/bin/env bash
# Prediction + ensembling pipeline (reference predict.sh:1-160): per-model
# do_pred at the tuned thresholds, then the category-aware threshold
# ensemble and submission packaging.
set -euo pipefail

DATA_DIR=${DATA_DIR:-data}
OUT=${OUT:-$DATA_DIR/output}
VOCAB=${VOCAB:-$DATA_DIR/vocab}
IA=${IA:-ia-tpu}

# per-model predictions (threshold 0.4 file naming, like the reference)
for model in roberta_large pkgm_large textcnn; do
  $IA finetune-text --data_dir "$DATA_DIR/processed" --output_dir "$OUT" \
    --vocab_path "$VOCAB" --config_file "configs/${model}.json" \
    --model_name "$model" --data_version v3.4 --threshold 0.4 --do_pred \
    ${EXTRA_FLAGS:-}
done

# threshold ensemble with the category-aware split (model_ensemble.py)
$IA ensemble --data_dir "$DATA_DIR" --ensemble_strategy threshold \
  --item_info "$DATA_DIR/raw/item_info.jsonl" \
  --models '[
    ["roberta_large-v3.4-one_tower-cls-NA-ce", 0.3, 0.8610],
    ["roberta_large-v3.4-one_tower-cls_1,2,3,4_cat-NA-ce", 0.4, 0.8600],
    ["roberta_image_large-v5-one_tower-cls-begin-ce", 0.4, 0.8582],
    ["eca_nfnet_l0-v6-two_tower-cls-NA-ce", 0.4, 0.7777],
    ["pkgm_large-v3.4-one_tower-cls-NA-ce", 0.4, 0.8096],
    ["bert_base-one_tower-cls-NA-ce", 0.3, 0.8510],
    ["textcnn-v3.4-two_tower-cls-NA-ce", 0.6, 0.7703]]' \
  --models_unseen '[
    ["roberta_large-v3.4-one_tower-cls-NA-ce", 0.4, 0.8610],
    ["roberta_large-v3.4-one_tower-cls_1,2,3,4_cat-NA-ce", 0.4, 0.8600],
    ["roberta_image_large-v5-one_tower-cls-begin-ce", 0.4, 0.8582],
    ["pkgm_large-v3.4-one_tower-cls-NA-ce", 0.5, 0.8096],
    ["bert_base-one_tower-cls-NA-ce", 0.4, 0.8510],
    ["textcnn-v3.4-two_tower-cls-NA-ce", 0.6, 0.7703]]'

# package result.zip for the scorer
python - <<'EOF'
import os
from item_alignment_tpu.aggregate.submit import package_submission, validate_submission
data_dir = os.environ.get("DATA_DIR", "data")
result = os.path.join(data_dir, "output", "ensemble", "deepAI_result.jsonl")
print(validate_submission(result))
print(package_submission(result, os.path.join(data_dir, "result.zip")))
EOF
