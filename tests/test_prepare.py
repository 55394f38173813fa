"""Offline preparation pipeline on a synthetic corpus: relation stats,
shared-first pv ordering, KG files, splits, easy negatives."""

import json
import os

import pytest

from item_alignment_tpu.data import prepare as P
from item_alignment_tpu.data.tokenization import load_kg_tokenizers


@pytest.fixture()
def corpus(tmp_path):
    items = [
        {"item_id": "a1", "cate_name": "coffee", "cate_id": "c1",
         "industry_name": "kitchen", "title": "红色咖啡机",
         "item_pvs": "品牌#:#acme#;#容量#:#12", "sku_pvs": "颜色#:#红"},
        {"item_id": "a2", "cate_name": "coffee", "cate_id": "c1",
         "industry_name": "kitchen", "title": "红色咖啡机豪华",
         "item_pvs": "品牌#:#acme#;#容量#:#12#;#功率#:#800w", "sku_pvs": ""},
        {"item_id": "b1", "cate_name": "watch", "cate_id": "c2",
         "industry_name": "fashion", "title": "黑色手表",
         "item_pvs": "品牌#:#timex#;#表带#:#皮", "sku_pvs": ""},
        {"item_id": "b2", "cate_name": "watch", "cate_id": "c2",
         "industry_name": "fashion", "title": "金色手表",
         "item_pvs": "品牌#:#rolex#;#表带#:#钢", "sku_pvs": ""},
    ]
    pairs = [
        {"src_item_id": "a1", "tgt_item_id": "a2", "item_label": "1"},
        {"src_item_id": "b1", "tgt_item_id": "b2", "item_label": "0"},
    ]
    data_dir = tmp_path / "raw"
    data_dir.mkdir()
    with open(data_dir / "item_info.jsonl", "w", encoding="utf-8") as w:
        for it in items:
            w.write(json.dumps(it, ensure_ascii=False) + "\n")
    with open(data_dir / "item_train_pair.jsonl", "w", encoding="utf-8") as w:
        for p in pairs:
            w.write(json.dumps(p) + "\n")
    return str(data_dir), str(tmp_path / "out")


def test_parse_pvs_merges_item_and_sku():
    pvs = P.parse_pvs({"item_pvs": "品牌#:#acme#;#容量#:#12",
                       "sku_pvs": "颜色#:#红#;#容量#:#12"})
    assert pvs == {"品牌": {"acme"}, "容量": {"12"}, "颜色": {"红"}}


def test_relation_stats_and_rates(corpus):
    data_dir, _ = corpus
    id_dict, cate_count, rc = P.load_item_info(
        os.path.join(data_dir, "item_info.jsonl"))
    P.accumulate_pair_statistics(id_dict, rc,
                                 os.path.join(data_dir, "item_train_pair.jsonl"))
    P.filter_relations(rc, cate_count, min_freq=1)
    # coffee pair label=1: 品牌 same, 容量 same
    assert rc["coffee"]["品牌"]["1-same"] == 1
    assert rc["coffee"]["品牌"]["1-same-rate"] == 1.0
    # watch pair label=0: 品牌 diff, 表带 diff
    assert rc["watch"]["品牌"]["0-diff"] == 1
    assert rc["watch"]["品牌"]["0-diff-rate"] == 1.0


def test_shared_keys_come_first(corpus):
    data_dir, _ = corpus
    id_dict, cate_count, rc = P.load_item_info(
        os.path.join(data_dir, "item_info.jsonl"))
    P.accumulate_pair_statistics(id_dict, rc,
                                 os.path.join(data_dir, "item_train_pair.jsonl"))
    P.filter_relations(rc, cate_count, min_freq=1)
    src, tgt = P.order_pvs_pair(id_dict["a1"]["pvs"], id_dict["a2"]["pvs"],
                                rc, "coffee", "coffee")
    src_keys = [kv.split(":")[0] for kv in src.split(";")]
    tgt_keys = [kv.split(":")[0] for kv in tgt.split(";")]
    # shared: 品牌(freq 2+2), 容量(2+2); distinct: src 颜色, tgt 功率
    assert src_keys[:2] == tgt_keys[:2]
    assert set(src_keys[:2]) == {"品牌", "容量"}
    assert src_keys[2] == "颜色" and tgt_keys[2] == "功率"


def test_prepare_all_outputs(corpus):
    data_dir, out_dir = corpus
    files = P.prepare_all(data_dir, out_dir, valid_proportion=0.5, seed=1)
    assert os.path.exists(files["train"]) and os.path.exists(files["valid"])
    ent, rel = load_kg_tokenizers(os.path.join(out_dir, "entity2id.txt"),
                                  os.path.join(out_dir, "relation2id.txt"))
    assert "/item/a1" in ent
    assert rel["[PAD]"] == 0
    # every pv relation got an id
    for r in ("品牌", "容量", "颜色", "功率", "表带"):
        assert r in rel
    # train2id rows reference known names
    with open(os.path.join(out_dir, "train2id.txt"), encoding="utf-8") as f:
        for line in f:
            h, r, t = line.strip("\n").split("\t")
            assert h in ent and r in rel and t in ent
    # TSVs round-trip through the finetune loader
    rows = P.read_finetune_tsv(files["train"])
    assert all(len(row) == 9 for row in rows)


def test_prev_valid_pins_split(corpus):
    data_dir, out_dir = corpus
    id_dict, cate_count, rc = P.load_item_info(
        os.path.join(data_dir, "item_info.jsonl"))
    P.accumulate_pair_statistics(id_dict, rc,
                                 os.path.join(data_dir, "item_train_pair.jsonl"))
    P.filter_relations(rc, cate_count, min_freq=1)
    pairs = P.build_finetune_pairs(
        id_dict, rc, os.path.join(data_dir, "item_train_pair.jsonl"))
    train1, valid1 = P.split_train_valid(pairs, 0.5, seed=7)
    prev = os.path.join(out_dir, "prev_valid.tsv")
    P.write_tsv(valid1, prev)
    train2, valid2 = P.split_train_valid(pairs, 0.5, seed=99, prev_valid=prev)
    assert sorted(valid2) == sorted(valid1)
    assert sorted(train2) == sorted(train1)


def test_easy_negatives_cross_category(corpus):
    data_dir, _ = corpus
    id_dict, cate_count, rc = P.load_item_info(
        os.path.join(data_dir, "item_info.jsonl"))
    P.filter_relations(rc, cate_count, min_freq=1)
    rows = P.augment_easy_negatives(id_dict, rc, num_items=4, num_neg=1, seed=3)
    assert rows
    for row in rows:
        assert row[0] == "0"
        c1 = id_dict[row[1]]["cate_name"]
        c2 = id_dict[row[4]]["cate_name"]
        assert c1 != c2
