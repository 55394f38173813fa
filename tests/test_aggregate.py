"""Model soup, ensemble and checkpoint helpers."""

import json
import numpy as np
import jax.numpy as jnp

from item_alignment_tpu.aggregate.soup import uniform_soup, greedy_soup
from item_alignment_tpu.aggregate.ensemble import (
    ensemble_predictions,
    make_unseen_checker,
    parse_prob,
    read_prediction_file,
    write_prediction_file,
)
from item_alignment_tpu.engine.checkpoint import (
    load_params,
    merge_param_sources,
    save_params,
)


def _tree(v):
    return {"dense": {"kernel": jnp.full((2, 2), v), "bias": jnp.full((2,), v)}}


def test_uniform_soup_averages():
    soup = uniform_soup([_tree(1.0), _tree(3.0)])
    np.testing.assert_allclose(np.asarray(soup["dense"]["kernel"]), 2.0)


def test_uniform_soup_include_filter():
    soup = uniform_soup([_tree(1.0), _tree(3.0)],
                        include=lambda path: "kernel" in str(path[-1]))
    np.testing.assert_allclose(np.asarray(soup["dense"]["kernel"]), 2.0)
    np.testing.assert_allclose(np.asarray(soup["dense"]["bias"]), 3.0)  # last


def test_greedy_soup_keeps_best():
    # score = -|mean - 2|: tree(2) is best alone; tree(10) hurts
    def score(tree):
        return -abs(float(np.asarray(tree["dense"]["kernel"]).mean()) - 2.0)
    soup = greedy_soup([_tree(10.0), _tree(2.0)], score)
    np.testing.assert_allclose(np.asarray(soup["dense"]["kernel"]), 2.0)


def _rows(probs, ids=None):
    out = []
    for i, p in enumerate(probs):
        sid = ids[i] if ids else f"s{i}"
        out.append({"src_item_id": sid, "src_item_emb": "[0]",
                    "tgt_item_id": f"t{i}", "tgt_item_emb": f"[{p}]",
                    "threshold": 0.5})
    return out


def test_threshold_ensemble_sums_margins():
    m1 = (_rows([0.9, 0.2]), 0.5, 0.8)  # margins +0.4, -0.3
    m2 = (_rows([0.4, 0.6]), 0.5, 0.7)  # margins -0.1, +0.1
    fused = ensemble_predictions([m1, m2], strategy="threshold")
    by_key = {r["src_item_id"]: parse_prob(r["tgt_item_emb"]) for r in fused}
    assert abs(by_key["s0"] - 0.3) < 1e-9   # 0.4 - 0.1
    assert abs(by_key["s1"] - (-0.2)) < 1e-9
    # decision: score >= 0 -> same product
    assert by_key["s0"] >= 0 > by_key["s1"]


def test_f1_ensemble_weighted_vote():
    m1 = (_rows([0.9]), 0.5, 0.9)   # votes 1 with weight .9
    m2 = (_rows([0.1]), 0.5, 0.3)   # votes 0 with weight .3
    fused = ensemble_predictions([m1, m2], strategy="f1")
    assert parse_prob(fused[0]["tgt_item_emb"]) == 1.0


def test_category_aware_split():
    id_dict = {"s0": {"cate_name": "鞋柜"}, "t0": {"cate_name": "鞋柜"},
               "s1": {"cate_name": "咖啡机"}, "t1": {"cate_name": "咖啡机"}}
    unseen = make_unseen_checker(id_dict)
    seen_models = [(_rows([0.9, 0.9]), 0.5, 1.0)]
    unseen_models = [(_rows([0.1, 0.1]), 0.5, 1.0)]
    fused = ensemble_predictions(seen_models, "threshold",
                                 unseen_model_predictions=unseen_models,
                                 pair_is_unseen=unseen)
    by_key = {r["src_item_id"]: parse_prob(r["tgt_item_emb"]) for r in fused}
    assert by_key["s0"] < 0  # unseen category pair used the unseen model list
    assert by_key["s1"] > 0


def test_prediction_file_roundtrip(tmp_path):
    rows = _rows([0.25, 0.75])
    path = write_prediction_file(rows, str(tmp_path / "x.jsonl"))
    back = read_prediction_file(path)
    assert back == rows


def test_save_load_params_roundtrip(tmp_path):
    tree = _tree(1.5)
    path = str(tmp_path / "params.msgpack")
    save_params(path, tree)
    restored = load_params(path, _tree(0.0))
    np.testing.assert_allclose(np.asarray(restored["dense"]["kernel"]), 1.5)


def test_merge_param_sources():
    base = {"roberta": {"embeddings": {"word": np.zeros(3)}},
            "head": {"kernel": np.zeros(2)}}
    merged = merge_param_sources(
        base, {"roberta/embeddings/ent_emb": np.ones(4)},
        {("head", "kernel"): np.full(2, 7.0)})
    np.testing.assert_allclose(merged["roberta"]["embeddings"]["ent_emb"], 1.0)
    np.testing.assert_allclose(merged["head"]["kernel"], 7.0)
    np.testing.assert_allclose(merged["roberta"]["embeddings"]["word"], 0.0)
