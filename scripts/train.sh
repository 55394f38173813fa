#!/usr/bin/env bash
# Reproduction pipeline: train the 8 ensemble members with the reference's
# blessed hyperparameters (reference train.sh:1-140), via the ia-tpu CLI.
#
# Inputs under $DATA_DIR: raw/item_info.jsonl, raw/item_train_pair.jsonl,
# vocab/ (BERT vocab dir), pretrained/ (pytorch_model.bin [+ pkgm_model.bin]).
set -euo pipefail

DATA_DIR=${DATA_DIR:-data}
OUT=${OUT:-$DATA_DIR/output}
VOCAB=${VOCAB:-$DATA_DIR/vocab}
PRETRAINED=${PRETRAINED:-$DATA_DIR/pretrained}
IA=${IA:-ia-tpu}

# 0. offline preparation (shared-pvs-first v3.4 ordering, KG id maps)
$IA prepare --data_dir "$DATA_DIR/raw" --output_dir "$DATA_DIR/processed" \
  --valid_proportion 0.1 --num_train_augment 0

# 1. PKGM pretraining (TransE-style KG embeddings, margin loss, bern n_neg=3)
$IA pkgm-pretrain --data_dir "$DATA_DIR/processed" \
  --output_dir "$DATA_DIR/kge" --model_name pkgm --embedding_dim 1024 \
  --batch_size 32768 --epochs 500 --learning_rate 1e-4 --margin 1.0 --n_neg 3

# 2. roberta_large v3.4 one-tower cls (the flagship; lr 5e-5 bs 40 seq 50+205)
$IA finetune-text --data_dir "$DATA_DIR/processed" --output_dir "$OUT" \
  --vocab_path "$VOCAB" --config_file configs/roberta_large.json \
  --pretrained_model_path "$PRETRAINED" \
  --model_name roberta_large --data_version v3.4 \
  --max_seq_len 50 --max_seq_len_pv 205 --train_batch_size 40 \
  --learning_rate 5e-5 --epochs 10 --bf16 --do_train --do_eval

# 3. roberta_large cls_1,2,3,4_cat variant
$IA finetune-text --data_dir "$DATA_DIR/processed" --output_dir "$OUT" \
  --vocab_path "$VOCAB" --config_file configs/roberta_large.json \
  --pretrained_model_path "$PRETRAINED" \
  --model_name roberta_large --data_version v3.4 --cls_layers 1,2,3,4 \
  --cls_pool cat --max_seq_len 50 --max_seq_len_pv 205 \
  --train_batch_size 40 --learning_rate 5e-5 --epochs 10 --bf16 --do_train

# 4. pkgm_large one-tower (seq 64, max_pvs 30, bs 256)
$IA finetune-text --data_dir "$DATA_DIR/processed" --output_dir "$OUT" \
  --vocab_path "$VOCAB" --config_file configs/pkgm_large.json \
  --pretrained_model_path "$PRETRAINED" \
  --entity2id "$DATA_DIR/processed/entity2id.txt" \
  --relation2id "$DATA_DIR/processed/relation2id.txt" \
  --model_name pkgm_large --data_version v3.4 \
  --max_seq_len 64 --max_pvs 30 --train_batch_size 256 \
  --learning_rate 5e-5 --epochs 10 --bf16 --do_train

# 5. textcnn two-tower
$IA finetune-text --data_dir "$DATA_DIR/processed" --output_dir "$OUT" \
  --vocab_path "$VOCAB" --config_file configs/textcnn.json \
  --model_name textcnn --data_version v3.4 --interaction_type two_tower \
  --max_seq_len 50 --max_seq_len_pv 205 --train_batch_size 64 \
  --learning_rate 1e-3 --epochs 10 --do_train

# 6. roberta_image_large v5 one-tower ensemble=begin
$IA finetune-multimodal --data_dir "$DATA_DIR/processed_image" \
  --output_dir "$OUT" --vocab_path "$VOCAB" \
  --config_file configs/roberta_image_large.json \
  --model_name roberta_image_large --data_version v5 --ensemble begin \
  --max_seq_len 50 --max_seq_len_pv 205 --train_batch_size 32 \
  --learning_rate 5e-5 --epochs 10 --bf16 --do_train

# 7. eca_nfnet_l0 image two-tower (image_size 1000 in the reference; 800
#    keeps v5e HBM happy at batch 16)
$IA finetune-image --data_dir "$DATA_DIR" --output_dir "$OUT" \
  --shards "$DATA_DIR"/image_shards/train_feat_*.npz \
  --model_name eca_nfnet_l0 --data_version v6 --image_size 800 \
  --train_batch_size 16 --learning_rate 1e-4 --epochs 10 --bf16 --do_train

# 8. legacy 5-field bert with MIX adversarial noise
$IA finetune-bert --train_file "$DATA_DIR/item-align-train.json" \
  --valid_file "$DATA_DIR/item-align-val.json" --vocab_path "$VOCAB" \
  --config_file configs/roberta_base.json --output_dir "$OUT/bert_base" \
  --batch_size 8 --epochs 3 --adversarial MIX

# 9. GCN over the item/attribute graph (features from pred-text)
$IA pred-text --entity2id "$DATA_DIR/processed/entity2id.txt" \
  --item_info "$DATA_DIR/raw/item_info.jsonl" --vocab_path "$VOCAB" \
  --output "$DATA_DIR/feature_matrix.npy"
$IA finetune-graph --feature_matrix "$DATA_DIR/feature_matrix.npy" \
  --edges "$DATA_DIR/edges.npz" \
  --train_pairs "$DATA_DIR/item_train_train_pair.jsonl" \
  --valid_pairs "$DATA_DIR/item_train_valid_pair.jsonl" \
  --output_dir "$OUT/gcn"
