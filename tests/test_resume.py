"""Kill-and-resume: a run checkpointed mid-way and resumed by a fresh
Trainer must reproduce the uninterrupted run's loss curve and final
parameters (reference ``finetune_bert.py:198-207, 396-415`` saves/restores
model+optimizer+scheduler+global_steps the same way)."""

import numpy as np
import jax
import pytest

from item_alignment_tpu.config import (
    MeshConfig, ModelConfig, OptimizerConfig, TrainConfig,
)
from item_alignment_tpu.engine.train import Trainer
from item_alignment_tpu.models.text import TextCNNTwoTower

from test_engine import make_pair_dataset

EPOCHS = 4


def _cfg(tmpdir=None, epochs=EPOCHS, resume=False):
    return TrainConfig(
        train_batch_size=16, eval_batch_size=16, num_epochs=epochs,
        log_steps=100, mesh=MeshConfig(data=-1),
        checkpoint_dir=tmpdir, resume=resume,
        optimizer=OptimizerConfig(learning_rate=2e-3, total_steps=EPOCHS * 4,
                                  warmup_proportion=0.1),
    )


def _model():
    cfg = ModelConfig.textcnn(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
        vocab_size=50, max_position_embeddings=64, num_filters=8,
        hidden_dropout_prob=0.0)
    return TextCNNTwoTower(cfg)


def test_kill_and_resume_reproduces_uninterrupted_run(tmp_path):
    ds = make_pair_dataset()
    ckpt_dir = str(tmp_path / "ckpt")

    # uninterrupted run
    t_full = Trainer(_model(), _cfg())
    full = t_full.fit(ds, ds)

    # interrupted run: 2 epochs with checkpointing, then the process "dies"
    t_a = Trainer(_model(), _cfg(ckpt_dir, epochs=2))
    part_a = t_a.fit(ds, ds)
    del t_a

    # fresh process: new Trainer resumes from the latest full train state
    t_b = Trainer(_model(), _cfg(ckpt_dir, epochs=EPOCHS, resume=True))
    part_b = t_b.fit(ds, ds)

    # epochs 2..3 ran (not 0..3 again)
    assert [h["epoch"] for h in part_b["history"]] == [2, 3]
    # the stitched loss curve matches the uninterrupted one
    full_losses = [h["loss"] for h in full["history"]]
    stitched = [h["loss"] for h in part_a["history"]] + \
               [h["loss"] for h in part_b["history"]]
    np.testing.assert_allclose(stitched, full_losses, rtol=1e-5)
    # final parameters match
    for a, b in zip(jax.tree.leaves(t_full.state.params),
                    jax.tree.leaves(t_b.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # optimizer step count continued
    assert int(t_b.state.step) == int(t_full.state.step)
    # best-F1 bookkeeping survived the restart
    assert part_b["best"]["best_f1"] >= part_a["best"]["best_f1"]
    assert t_b.best_params is not None


def test_resume_without_checkpoint_starts_fresh(tmp_path):
    ds = make_pair_dataset(n=32)
    t = Trainer(_model(), _cfg(str(tmp_path / "empty"), epochs=1, resume=True))
    out = t.fit(ds, ds)
    assert [h["epoch"] for h in out["history"]] == [0]
