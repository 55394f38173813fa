"""Orbax CheckpointManager wrapper + PKGM finetune through the CLI."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from item_alignment_tpu.engine.checkpoint import CheckpointManager


def test_checkpoint_manager_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    tree = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "step": np.asarray(7, np.int32)}
    mgr.save(1, tree)
    mgr.save(2, {"params": {"w": np.ones((2, 3), np.float32)},
                 "step": np.asarray(8, np.int32)})
    assert mgr.latest_step() == 2
    restored = mgr.restore(1, like=tree)
    np.testing.assert_array_equal(restored["params"]["w"],
                                  tree["params"]["w"])
    mgr.save(3, tree)
    # keep=2: step 1 evicted
    assert sorted(mgr.all_steps()) == [2, 3]


def test_pkgm_finetune_cli(tmp_path, capsys):
    from item_alignment_tpu.cli import main

    vocab = ["[PAD]"] + [f"[unused{i}]" for i in range(1, 100)] + \
        ["[UNK]", "[CLS]", "[SEP]", "[MASK]", ":", ";", "a", "b", "商", "品"] \
        + ["<S>"]
    vd = tmp_path / "vocab"
    vd.mkdir()
    (vd / "vocab.txt").write_text("\n".join(vocab), encoding="utf-8")
    (tmp_path / "tiny.json").write_text(json.dumps({
        "hidden_size": 32, "num_hidden_layers": 1, "num_attention_heads": 4,
        "intermediate_size": 64, "max_position_embeddings": 64,
        "kg_embedding_dim": 32, "hidden_dropout_prob": 0.0}))
    with open(tmp_path / "entity2id.txt", "w") as w:
        for i in range(8):
            w.write(f"/item/s{i}\t{2*i}\n/item/t{i}\t{2*i+1}\n")
    with open(tmp_path / "relation2id.txt", "w") as w:
        w.write("[PAD]\t0\na\t1\nb\t2\n")
    rows = [(str(i % 2), f"s{i}", "商品 a", "a:b;b:a", f"t{i}", "商品 b", "a:b")
            for i in range(6)]
    with open(tmp_path / "finetune_train_train.tsv", "w") as w:
        for r in rows:
            w.write("\t".join(r) + "\n")
    with open(tmp_path / "finetune_train_valid.tsv", "w") as w:
        for r in rows[:2]:
            w.write("\t".join(r) + "\n")

    rc = main(["finetune-text", "--data_dir", str(tmp_path),
               "--output_dir", str(tmp_path / "out"),
               "--vocab_path", str(vd),
               "--config_file", str(tmp_path / "tiny.json"),
               "--model_name", "pkgm_tiny",
               "--entity2id", str(tmp_path / "entity2id.txt"),
               "--relation2id", str(tmp_path / "relation2id.txt"),
               "--max_seq_len", "8", "--max_pvs", "3",
               "--train_batch_size", "2", "--eval_batch_size", "2",
               "--epochs", "1", "--mesh", "1,1,1",
               "--do_train", "--do_eval", "--do_pred"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    pred = json.loads(out[-1])
    assert os.path.exists(pred["prediction_file"])
    rows_out = [json.loads(l) for l in open(pred["prediction_file"])]
    assert len(rows_out) == 2
