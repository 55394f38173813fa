"""CoCa finetune through the multimodal CLI: 7-col TSV + images dir."""

import json
import os

import numpy as np
import pytest

from item_alignment_tpu.cli import main


def test_finetune_multimodal_coca(tmp_path, capsys):
    from PIL import Image

    vocab = ["[PAD]"] + [f"[unused{i}]" for i in range(1, 100)] + \
        ["[UNK]", "[CLS]", "[SEP]", "[MASK]", ":", ";", "a", "b", "商", "品"] \
        + ["<S>"]
    vd = tmp_path / "vocab"
    vd.mkdir()
    (vd / "vocab.txt").write_text("\n".join(vocab), encoding="utf-8")
    cfgp = tmp_path / "tiny.json"
    cfgp.write_text(json.dumps({
        "hidden_size": 32, "num_hidden_layers": 1, "num_attention_heads": 4,
        "intermediate_size": 64, "max_position_embeddings": 64,
        "multimodal_depth": 1, "coca_heads": 4, "ff_mult": 2,
        "patch_size": 8, "hidden_dropout_prob": 0.0}))

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    rows = []
    rs = np.random.RandomState(0)
    for i in range(4):
        for iid in (f"s{i}", f"t{i}"):
            Image.fromarray(rs.randint(0, 255, (20, 20, 3), np.uint8)).save(
                imgs / f"{iid}.png")
        rows.append((str(i % 2), f"s{i}", "商品 a", "a:b", f"t{i}",
                     "商品 b", "a:b"))
    with open(tmp_path / "finetune_train_train.tsv", "w") as w:
        for r in rows:
            w.write("\t".join(r) + "\n")

    rc = main(["finetune-multimodal", "--data_dir", str(tmp_path),
               "--output_dir", str(tmp_path / "out"),
               "--vocab_path", str(vd), "--config_file", str(cfgp),
               "--model_name", "coca_tiny", "--ensemble", "sum",
               "--images_dir", str(imgs), "--image_size", "16",
               "--max_seq_len", "6", "--max_seq_len_pv", "6",
               "--train_batch_size", "2", "--eval_batch_size", "2",
               "--epochs", "1", "--mesh", "1,1,1", "--do_train"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "best" in out
