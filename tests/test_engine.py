"""End-to-end engine test: a tiny TextCNN two-tower learns a separable
synthetic pair task through the Trainer (the SURVEY.md §7 minimum slice),
on an 8-device CPU mesh with DP sharding."""

import os

import numpy as np
import jax
import pytest

from item_alignment_tpu.config import (
    MeshConfig, ModelConfig, OptimizerConfig, TrainConfig,
)
from item_alignment_tpu.data.datasets import ArrayDataset
from item_alignment_tpu.engine.train import Trainer
from item_alignment_tpu.engine import metrics as M
from item_alignment_tpu.models.text import TextCNNTwoTower


def make_pair_dataset(n=64, seq=16, vocab=50, seed=0):
    rs = np.random.RandomState(seed)
    a = rs.randint(5, vocab, (n, seq))
    b = a.copy()
    neg = rs.rand(n) < 0.5
    b[neg] = rs.randint(5, vocab, (int(neg.sum()), seq))
    labels = (~neg).astype(np.int32)
    ids = [f"item{i}" for i in range(n)]
    return ArrayDataset(
        {"input_ids_1": a.astype(np.int32), "input_ids_2": b.astype(np.int32),
         "labels": labels},
        meta={"src_item_id": ids, "tgt_item_id": [f"t{j}" for j in range(n)]},
    )


@pytest.fixture(scope="module")
def trained():
    cfg = ModelConfig.textcnn(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
        vocab_size=50, max_position_embeddings=64, num_filters=8,
        hidden_dropout_prob=0.0)
    model = TextCNNTwoTower(cfg)
    tcfg = TrainConfig(
        train_batch_size=16, eval_batch_size=16, num_epochs=6, log_steps=100,
        mesh=MeshConfig(data=-1),
        optimizer=OptimizerConfig(learning_rate=2e-3, total_steps=6 * 4,
                                  warmup_proportion=0.1),
    )
    trainer = Trainer(model, tcfg)
    ds = make_pair_dataset()
    result = trainer.fit(ds, ds)
    return trainer, ds, result


def test_mesh_uses_all_devices(trained):
    trainer, _, _ = trained
    assert trainer.mesh.devices.size == jax.device_count()


def test_training_learns(trained):
    trainer, ds, result = trained
    assert result["best"]["best_f1"] > 0.9, result


def test_eval_outputs_align_with_dataset(trained):
    trainer, ds, _ = trained
    ev = trainer.evaluate(ds)
    assert len(ev["probs"]) == len(ds)
    assert len(ev["sweep"]) == 9


def test_predict_jsonl_format(tmp_path, trained):
    import json
    trainer, ds, _ = trained
    path = str(tmp_path / "deepAI_result.jsonl")
    trainer.predict_jsonl(ds, path, threshold=0.4)
    rows = [json.loads(l) for l in open(path)]
    assert len(rows) == len(ds)
    r = rows[0]
    assert set(r) == {"src_item_id", "src_item_emb", "tgt_item_id",
                      "tgt_item_emb", "threshold"}
    assert r["threshold"] == 0.4
    assert r["src_item_id"] == "item0"
    # probability smuggled as a 1-element embedding string "[p]"
    p = float(r["tgt_item_emb"].strip("[]").split(",")[0])
    assert 0.0 <= p <= 1.0


def test_last_partial_batch_padded_not_dropped(trained):
    trainer, ds, _ = trained
    small = ds.select(np.arange(19))  # not a multiple of 16
    ev = trainer.evaluate(small)
    assert len(ev["probs"]) == 19


def test_eval_every_steps_mid_epoch():
    """Step-cadence eval (reference finetune_bert.py evaluates every 1000
    steps): mid-epoch evals appear in the epoch history."""
    cfg = ModelConfig.textcnn(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
        vocab_size=50, max_position_embeddings=64, num_filters=8,
        hidden_dropout_prob=0.0)
    tcfg = TrainConfig(
        train_batch_size=16, eval_batch_size=16, num_epochs=1, log_steps=100,
        eval_every_steps=2, mesh=MeshConfig(data=-1),
        optimizer=OptimizerConfig(learning_rate=2e-3, total_steps=4))
    trainer = Trainer(TextCNNTwoTower(cfg), tcfg)
    ds = make_pair_dataset()  # 64 rows -> 4 steps/epoch
    result = trainer.fit(ds, ds)
    mid = result["history"][0].get("mid_evals")
    assert mid and [m["step"] for m in mid] == [2, 4]
    assert all(0.0 <= m["best_f1"] <= 1.0 for m in mid)


def test_parameter_freezing():
    """--parameters_to_freeze parity (finetune_text.py:257-272): frozen
    leaves are bitwise unchanged after training steps; others move."""
    cfg = ModelConfig.textcnn(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
        vocab_size=50, max_position_embeddings=64, num_filters=8,
        hidden_dropout_prob=0.0)
    tcfg = TrainConfig(
        train_batch_size=16, eval_batch_size=16, num_epochs=1, log_steps=100,
        mesh=MeshConfig(data=-1),
        optimizer=OptimizerConfig(learning_rate=2e-3, total_steps=4,
                                  freeze_patterns=("embed",)))
    trainer = Trainer(TextCNNTwoTower(cfg), tcfg)
    ds = make_pair_dataset()
    trainer.setup(next(ds.batches(16))[0])
    before = jax.tree.map(np.asarray, trainer.state.params)
    trainer.fit(ds)

    after = jax.tree.map(np.asarray, trainer.state.params)
    flat_b = jax.tree_util.tree_flatten_with_path(before)[0]
    flat_a = jax.tree_util.tree_flatten_with_path(after)[0]
    n_frozen = n_moved = 0
    for (path_b, b), (_, a) in zip(flat_b, flat_a):
        name = "/".join(str(getattr(k, "key", k)) for k in path_b)
        if "embed" in name:
            np.testing.assert_array_equal(b, a, err_msg=f"{name} moved")
            n_frozen += 1
        elif not np.array_equal(b, a):
            n_moved += 1
    assert n_frozen > 0 and n_moved > 0


def test_scan_steps_trajectory_matches_per_step():
    """Device-side K-step scanning is a pure dispatch optimization: the
    param trajectory must equal per-step dispatch exactly (dropout included
    — the in-step rng folds the global step count, identical either way)."""
    cfg = ModelConfig.textcnn(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
        vocab_size=50, max_position_embeddings=64, num_filters=8,
        hidden_dropout_prob=0.1)
    ds = make_pair_dataset()  # 64 rows -> 4 steps/epoch at bs 16

    def run(scan_steps):
        tcfg = TrainConfig(
            train_batch_size=16, eval_batch_size=16, num_epochs=2,
            log_steps=100, scan_steps=scan_steps, mesh=MeshConfig(data=-1),
            optimizer=OptimizerConfig(learning_rate=2e-3, total_steps=8))
        trainer = Trainer(TextCNNTwoTower(cfg), tcfg)
        trainer.fit(ds)
        return jax.tree.map(np.asarray, trainer.state.params)

    p1 = run(1)
    p3 = run(3)  # does not divide 4: exercises the remainder path too
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p3)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
