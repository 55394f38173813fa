"""Multimodal dataset builders + Trainer logging integration."""

import json
import os

import numpy as np
import jax
import pytest


class CharTok:
    bos_token, sep_token = "<S>", "[SEP]"

    def __call__(self, text, max_length=16, padding="max_length",
                 truncation="longest_first"):
        # ids must stay < vocab_size=100 (OOB embedding gathers -> NaN)
        ids = [1] + [(ord(c) % 90) + 5 for c in text.replace(" ", "")][
            : max_length - 2] + [2]
        ids += [0] * (max_length - len(ids))
        mask = [1 if t != 0 else 0 for t in ids]
        return {"input_ids": ids, "attention_mask": mask,
                "token_type_ids": [0] * len(ids)}


def _loader(path):
    if "bad" in str(path) or not path:
        return None
    seed = abs(hash(path)) % 100
    return np.random.RandomState(seed).randint(0, 255, (40, 40, 3), np.uint8)


def test_multimodal_pretrain_builder_drops_broken():
    from item_alignment_tpu.data.tokenization import (
        build_multimodal_pretrain_dataset,
    )

    items = [
        {"item_id": "a", "title": "商品", "pvs": "k:v", "image_path": "a.png"},
        {"item_id": "b", "title": "商品", "pvs": "k:v", "image_path": "bad.png"},
        {"item_id": "c", "title": "商品", "pvs": "", "image_path": "c.png"},
    ]
    ds = build_multimodal_pretrain_dataset(items, CharTok(), _loader,
                                           max_seq_len=12, image_size=16)
    assert len(ds) == 2
    assert ds.arrays["images"].shape == (2, 16, 16, 3)
    assert ds.meta["item_id"] == ["a", "c"]


def test_multimodal_pair_builder_feeds_coca():
    import jax.numpy as jnp

    from item_alignment_tpu.config import ModelConfig
    from item_alignment_tpu.data.tokenization import (
        build_multimodal_pair_dataset,
    )
    from item_alignment_tpu.models.multimodal import CoCaForItemAlignment

    rows = [("1", "a", 0, "商品", "k:v", "c", 0, "商品", "k:w"),
            ("0", "a", 0, "商品", "k:v", "bad", 0, "商品", "k:w")]
    paths = {"a": "a.png", "c": "c.png", "bad": "bad.png"}
    ds = build_multimodal_pair_dataset(rows, CharTok(), _loader, paths,
                                       max_seq_len=6, max_seq_len_pv=6,
                                       image_size=16)
    assert len(ds) == 1  # broken-image pair dropped
    cfg = ModelConfig(model_name="coca", hidden_size=32, num_hidden_layers=1,
                      num_attention_heads=4, intermediate_size=64,
                      vocab_size=100, max_position_embeddings=64,
                      multimodal_depth=1, coca_heads=4, ff_mult=2,
                      image_size=16, patch_size=8, ensemble="sum")
    model = CoCaForItemAlignment(cfg)
    batch, _ = next(ds.batches(1))
    labels = jnp.asarray(batch.pop("labels"))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                                 labels=labels, **batch)
    out = jax.jit(model.apply)(params, labels=labels, **batch)
    assert np.isfinite(float(out.loss))


def test_trainer_logging_integration(tmp_path):
    from item_alignment_tpu.config import (
        MeshConfig, ModelConfig, OptimizerConfig, TrainConfig,
    )
    from item_alignment_tpu.data.datasets import ArrayDataset
    from item_alignment_tpu.engine.train import Trainer
    from item_alignment_tpu.models.text import TextCNNTwoTower

    rs = np.random.RandomState(0)
    a = rs.randint(5, 50, (16, 8)).astype(np.int32)
    ds = ArrayDataset({"input_ids_1": a, "input_ids_2": a,
                       "labels": (np.arange(16) % 2).astype(np.int32)})
    cfg = ModelConfig.textcnn(hidden_size=16, num_hidden_layers=1,
                              num_attention_heads=4, vocab_size=50,
                              max_position_embeddings=32, num_filters=4,
                              hidden_dropout_prob=0.0)
    tcfg = TrainConfig(train_batch_size=8, eval_batch_size=8, num_epochs=2,
                       log_steps=1, mesh=MeshConfig(),
                       optimizer=OptimizerConfig(total_steps=4))
    tr = Trainer(TextCNNTwoTower(cfg), tcfg, log_dir=str(tmp_path))
    tr.fit(ds, ds)
    scalars = [json.loads(l) for l in open(tmp_path / "scalars.jsonl")]
    assert any(s["tag"] == "train/loss" for s in scalars)
    assert any(s["tag"] == "eval/best_f1" for s in scalars)
    rows = open(tmp_path / "eval_results.csv").read().splitlines()
    assert len(rows) >= 3  # header + 2 epochs
    assert tr.best_params is not None
