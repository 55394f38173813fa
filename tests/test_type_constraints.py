"""OpenKE post-processing + pv-pair dataset variant."""

import numpy as np
import pytest

from item_alignment_tpu.kge.graph import KnowledgeGraph
from item_alignment_tpu.kge.type_constraints import (
    relation_categories,
    split_test_by_category,
    write_type_constraints,
)


def _kgs():
    # rel 0: each head one tail, each tail one head -> 1-1
    # rel 1: head 0 has 3 tails -> 1-n ; rel 2: tail 9 has 3 heads -> n-1
    h = np.array([0, 1, 0, 0, 0, 2, 3, 4])
    r = np.array([0, 0, 1, 1, 1, 2, 2, 2])
    t = np.array([5, 6, 7, 8, 6, 9, 9, 9])
    kg = KnowledgeGraph(h, r, t, n_ent=10, n_rel=3)
    # test triples are NEW facts (duplicates would double-count in the
    # tph/hpt averages, as in the reference's lef/rig accumulation)
    test = KnowledgeGraph(np.array([7, 1, 5]), np.array([0, 1, 2]),
                          np.array([8, 5, 9]), 10, 3)
    return kg, test


def test_relation_categories():
    kg, test = _kgs()
    cats = relation_categories(kg, test)
    assert cats[0] == "1-1"
    assert cats[1] == "1-n"
    assert cats[2] == "n-1"


def test_type_constrain_file(tmp_path):
    kg, test = _kgs()
    path = write_type_constraints(str(tmp_path), kg, kg_test=test)
    lines = open(path).read().splitlines()
    assert lines[0] == "3"
    # rel 0 heads line: "0 <count> heads..."
    first = lines[1].split("\t")
    assert first[0] == "0" and int(first[1]) == len(first) - 2


def test_split_test_by_category(tmp_path):
    kg, test = _kgs()
    counts = split_test_by_category(str(tmp_path), kg, test)
    assert counts == {"1-1": 1, "1-n": 1, "n-1": 1, "n-n": 0}
    rows = open(tmp_path / "1-n.txt").read().splitlines()
    assert rows[0] == "1" and rows[1] == "1 5 1"


def test_pv_pair_dataset(tmp_path):
    from transformers import BertTokenizer

    from item_alignment_tpu.data.tokenization import rows_to_pv_pair_dataset

    vocab = ["[PAD]"] + [f"[unused{i}]" for i in range(1, 100)] + \
        ["[UNK]", "[CLS]", "[SEP]", "[MASK]", ":", ";", "a", "b", "商", "品"] \
        + ["<S>"]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab), encoding="utf-8")
    tok = BertTokenizer.from_pretrained(str(tmp_path))
    tok.add_special_tokens({"bos_token": "<S>"})

    rows = [("1", "s0", "商品 a", "t0", "商品 b", "a:1;b:0")]
    ds = rows_to_pv_pair_dataset(rows, tok, max_seq_len=6, max_seq_len_pv=8)
    ids = ds.arrays["input_ids"][0]
    tt = ds.arrays["token_type_ids"][0]
    assert len(ids) == 2 * 6 + 8
    # token types bump +1 after the second [SEP]
    seps = [i for i, t in enumerate(ids) if t == tok.sep_token_id]
    assert tt[seps[1] + 1] == tt[seps[1]] + 1
