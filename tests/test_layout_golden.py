"""Golden layout parity: our offline layout builders must reproduce the
reference's Dataset outputs token-for-token.

The reference code at /root/reference is executed read-only as an oracle
(with a stub timm module); a synthetic BERT vocab pins the special ids the
reference hard-codes (IMG_TOKEN_ID=99, COLON_ID=131, SEMICOLON_ID=132,
``src/data/data.py:9-12``).
"""

import importlib.machinery
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference")


@pytest.fixture(scope="module")
def ref_data():
    import transformers  # noqa: F401  (must import before stubbing timm)
    for name, attrs in [("timm", {}), ("timm.data", {}),
                        ("timm.data.transforms_factory",
                         {"create_transform": lambda **kw: None})]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.data import data as ref_data_mod
    return ref_data_mod


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    """Synthetic Chinese-BERT-like vocab with the reference's special ids."""
    from transformers import BertTokenizer

    vocab = ["[PAD]"] + [f"[unused{i}]" for i in range(1, 100)] \
        + ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    chars = list("!\"#$%&'()*+,-./0123456789")  # 104..128
    vocab += chars
    vocab += ["<pad130>", "<pad131>"]  # align ':' to 131
    # adjust: current len = 104 + 25 + 2 = 131 -> ':' lands at 131
    vocab += [":", ";"]
    vocab += list("abcdefghijklmnopqrstuvwxyz")
    vocab += list("红色蓝咖啡机品牌型号容量大小规格手表电脑")
    vocab += ["<S>"]
    assert vocab.index(":") == 131 and vocab.index(";") == 132
    assert vocab.index("[unused99]") == 99
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(vocab), encoding="utf-8")
    tok = BertTokenizer.from_pretrained(str(p.parent))
    tok.add_special_tokens({"bos_token": "<S>"})
    return tok


ROWS = [
    ("1", "101", "c1", "红色咖啡机", "品牌:abc;容量:12", "201", "c2",
     "红色咖啡机", "品牌:abc;容量:15"),
    ("0", "102", "c1", "蓝色手表", "品牌:xyz;型号:a1", "202", "c3",
     "红色电脑", "品牌:abc;规格:9"),
]


def _ref_one_tower(ref_data, tokenizer, method, aux=False):
    ds = ref_data.RobertaOneTowerDataset(
        ROWS, tokenizer, max_seq_len=12, max_seq_len_pv=16,
        classification_method=method, auxiliary_task=aux)
    return [ds[i] for i in range(len(ds))]


@pytest.mark.parametrize("method", ["cls", "vec_sim"])
def test_one_tower_layout_matches_reference(ref_data, tokenizer, method):
    from item_alignment_tpu.data.tokenization import rows_to_one_tower_dataset

    ours = rows_to_one_tower_dataset(ROWS, tokenizer, 12, 16,
                                     classification_method=method)
    refs = _ref_one_tower(ref_data, tokenizer, method)
    for i, ref in enumerate(refs):
        np.testing.assert_array_equal(ours.arrays["input_ids"][i],
                                      ref["input_ids"], err_msg=f"row {i} ids")
        np.testing.assert_array_equal(ours.arrays["token_type_ids"][i],
                                      ref["token_type_ids"])
        np.testing.assert_array_equal(ours.arrays["attention_mask"][i],
                                      ref["attention_mask"])
        assert int(ours.arrays["labels"][i]) == ref["labels"]
        assert ours.meta["src_item_id"][i] == ref["src_item_id"]


def test_aux_pair_indices_match_reference(ref_data, tokenizer):
    from item_alignment_tpu.data.tokenization import rows_to_one_tower_dataset

    ours = rows_to_one_tower_dataset(ROWS, tokenizer, 12, 16,
                                     classification_method="cls",
                                     auxiliary_task=True, max_pairs=8)
    refs = _ref_one_tower(ref_data, tokenizer, "cls", aux=True)
    for i, ref in enumerate(refs):
        ref_pairs = np.asarray(ref["pair_indices"], dtype=np.int32).reshape(-1, 5)
        mine = ours.arrays["pair_spans"][i]
        valid = mine[mine[:, 0] >= 0]
        np.testing.assert_array_equal(valid, ref_pairs, err_msg=f"row {i}")


def test_pkgm_layout_matches_reference(ref_data, tokenizer):
    from item_alignment_tpu.data.tokenization import rows_to_pkgm_dataset

    kg_ent = {f"/item/{r[1]}": 10 + i for i, r in enumerate(ROWS)}
    kg_ent.update({f"/item/{r[5]}": 20 + i for i, r in enumerate(ROWS)})
    kg_rel = {"品牌": 1, "容量": 2, "型号": 3, "规格": 4}

    ref_ds = ref_data.PKGMOneTowerDataset(
        ROWS, tokenizer, kg_ent, kg_rel, max_seq_en=10, max_pvs=4,
        classification_method="cls")
    ours = rows_to_pkgm_dataset(ROWS, tokenizer, kg_ent, kg_rel,
                                max_seq_len=10, max_pvs=4,
                                classification_method="cls")
    for i in range(len(ROWS)):
        ref = ref_ds[i]
        for key in ("input_ids", "attention_mask", "token_type_ids",
                    "position_ids"):
            np.testing.assert_array_equal(
                ours.arrays[key][i], ref[key], err_msg=f"row {i} {key}")


def test_pkgm_two_tower_layout_matches_reference(ref_data, tokenizer):
    from item_alignment_tpu.data.tokenization import (
        rows_to_pkgm_two_tower_dataset,
    )

    kg_ent = {f"/item/{r[1]}": 10 + i for i, r in enumerate(ROWS)}
    kg_ent.update({f"/item/{r[5]}": 20 + i for i, r in enumerate(ROWS)})
    kg_rel = {"品牌": 1, "容量": 2, "型号": 3, "规格": 4}
    ref_ds = ref_data.PKGMTwoTowerDataset(ROWS, tokenizer, kg_ent, kg_rel,
                                          max_seq_en=10, max_pvs=4)
    ours = rows_to_pkgm_two_tower_dataset(ROWS, tokenizer, kg_ent, kg_rel,
                                          max_seq_len=10, max_pvs=4)
    for i in range(len(ROWS)):
        ref = ref_ds[i]
        for side in (1, 2):
            for key in ("input_ids", "attention_mask", "token_type_ids"):
                np.testing.assert_array_equal(
                    ours.arrays[f"{key}_{side}"][i], ref[f"{key}_{side}"],
                    err_msg=f"row {i} {key}_{side}")
        np.testing.assert_array_equal(ours.arrays["position_ids"][i],
                                      ref["position_ids"])


@pytest.fixture()
def img_tokenizer(tokenizer):
    """The image pipelines run with wordpiece-only tokenization
    (load_text_tokenizer sets do_basic_tokenize=False) so ``[unused99]``
    survives as one token; mirror that for the oracle comparison."""
    old = tokenizer.do_basic_tokenize
    tokenizer.do_basic_tokenize = False
    yield tokenizer
    tokenizer.do_basic_tokenize = old


IMG_ROWS = [
    ("1", "101", "红色咖啡机", "品牌:abc;容量:12", "0.5,0.25",
     "201", "红色咖啡机", "品牌:abc;容量:15", "0.75,0.125"),
    ("0", "102", "蓝色手表", "品牌:xyz;型号:a1", "1.0,2.0",
     "202", "红色电脑", "品牌:abc;规格:9", "3.0,4.0"),
]


@pytest.mark.parametrize("ensemble", ["begin", "end"])
@pytest.mark.parametrize("lens", [(12, 16), (12, None), (None, 16)])
def test_image_one_tower_layout_matches_reference(ref_data, img_tokenizer,
                                                  ensemble, lens):
    """RobertaImageOneTowerDataset (data.py:623-680): [IMG] [SEP] prefix only
    for ensemble=='begin'; title-only / pvs-only when a seq len is None."""
    from item_alignment_tpu.data.tokenization import (
        rows_to_image_one_tower_dataset,
    )

    msl, mspv = lens
    ref_ds = ref_data.RobertaImageOneTowerDataset(
        IMG_ROWS, img_tokenizer, max_seq_len=msl, ensemble=ensemble,
        max_seq_len_pv=mspv)
    ours = rows_to_image_one_tower_dataset(IMG_ROWS, img_tokenizer, msl, mspv,
                                           image_hidden_size=4,
                                           ensemble=ensemble)
    for i in range(len(IMG_ROWS)):
        ref = ref_ds[i]
        for key in ("input_ids", "token_type_ids", "attention_mask"):
            np.testing.assert_array_equal(
                ours.arrays[key][i], ref[key],
                err_msg=f"row {i} {key} ens={ensemble} lens={lens}")
        if ensemble == "begin":
            assert int(ours.arrays["image_indices"][i]) == ref["image_index"]
        np.testing.assert_allclose(ours.arrays["src_image_embeds"][i][:2],
                                   ref["src_img_emb"])


@pytest.mark.parametrize("ensemble", ["begin", "end"])
@pytest.mark.parametrize("lens", [(12, 16), (12, None), (None, 16)])
def test_image_two_tower_layout_matches_reference(ref_data, img_tokenizer,
                                                  ensemble, lens):
    """RobertaImageTwoTowerDataset (data.py:682-753)."""
    from item_alignment_tpu.data.tokenization import (
        rows_to_image_two_tower_dataset,
    )

    msl, mspv = lens
    ref_ds = ref_data.RobertaImageTwoTowerDataset(
        IMG_ROWS, img_tokenizer, max_seq_len=msl, ensemble=ensemble,
        max_seq_len_pv=mspv)
    ours = rows_to_image_two_tower_dataset(IMG_ROWS, img_tokenizer, msl, mspv,
                                           image_hidden_size=4,
                                           ensemble=ensemble)
    for i in range(len(IMG_ROWS)):
        ref = ref_ds[i]
        for side in (1, 2):
            for key in ("input_ids", "token_type_ids", "attention_mask"):
                np.testing.assert_array_equal(
                    ours.arrays[f"{key}_{side}"][i], ref[f"{key}_{side}"],
                    err_msg=f"row {i} {key}_{side} ens={ensemble} lens={lens}")
        np.testing.assert_allclose(ours.arrays["image_embeds_1"][i][:2],
                                   ref["src_img_emb"])
        np.testing.assert_allclose(ours.arrays["image_embeds_2"][i][:2],
                                   ref["tgt_img_emb"])


def test_two_tower_title_pv_text_construction(ref_data, tokenizer):
    """Two-tower per-item text must be `title [SEP] jieba(pvs)` tokenized to
    max_len (RobertaTwoTowerDataset, data.py:786-832)."""
    from item_alignment_tpu.data.tokenization import rows_to_two_tower_dataset

    ref_ds = ref_data.RobertaTwoTowerDataset(
        ROWS, tokenizer, max_seq_en=12, max_seq_len_pv=16)
    ours = rows_to_two_tower_dataset(ROWS, tokenizer, 12, 16)
    for i in range(len(ROWS)):
        ref = ref_ds[i]
        np.testing.assert_array_equal(ours.arrays["input_ids_1"][i],
                                      ref["input_ids_1"], err_msg=f"row {i}")
        np.testing.assert_array_equal(ours.arrays["input_ids_2"][i],
                                      ref["input_ids_2"])
