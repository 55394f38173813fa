"""Multiprocess tokenization must produce identical arrays to serial."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    from transformers import BertTokenizer

    vocab = ["[PAD]"] + [f"[unused{i}]" for i in range(1, 100)] + \
        ["[UNK]", "[CLS]", "[SEP]", "[MASK]", ":", ";", "a", "b", "商", "品"] \
        + ["<S>"]
    d = tmp_path_factory.mktemp("v")
    (d / "vocab.txt").write_text("\n".join(vocab), encoding="utf-8")
    t = BertTokenizer.from_pretrained(str(d))
    t.add_special_tokens({"bos_token": "<S>"})
    return t


def test_parallel_matches_serial(tok):
    from item_alignment_tpu.data.tokenization import rows_to_one_tower_dataset

    rows = [(str(i % 2), f"s{i}", 0, "商品 a", "a:b;b:a", f"t{i}", 0,
             "商品 b", "a:b") for i in range(64)]
    serial = rows_to_one_tower_dataset(rows, tok, 6, 6, num_workers=0)
    par = rows_to_one_tower_dataset(rows, tok, 6, 6, num_workers=4)
    for k in serial.arrays:
        np.testing.assert_array_equal(serial.arrays[k], par.arrays[k], k)
    assert serial.meta == par.meta
