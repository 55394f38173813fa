"""KGE extras: positional sampler, torus dissimilarities, inference,
redundancy analysis, submission packaging."""

import numpy as np
import jax
import jax.numpy as jnp

from item_alignment_tpu.kge.graph import KnowledgeGraph
from item_alignment_tpu.kge.inference import EntityInference, RelationInference
from item_alignment_tpu.kge.models import dissimilarity, make_kge_model
from item_alignment_tpu.kge.redundancy import (
    cartesian_product_relations,
    duplicates,
)
from item_alignment_tpu.kge.sampling import PositionalNegativeSampler


def _kg():
    h = np.array([0, 1, 2, 3, 0, 1])
    r = np.array([0, 0, 0, 0, 1, 1])
    t = np.array([4, 4, 5, 5, 6, 7])
    return KnowledgeGraph(h, r, t, n_ent=8, n_rel=2)


def test_positional_sampler_draws_from_observed_pools():
    kg = _kg()
    sampler = PositionalNegativeSampler(kg, n_neg=4)
    nh, nt = sampler.corrupt_batch(jax.random.PRNGKey(0), kg.head_idx,
                                   kg.tail_idx, kg.relations)
    nh, nt = np.asarray(nh), np.asarray(nt)
    rels = np.tile(kg.relations, 4)
    heads_pool = {0: {0, 1, 2, 3}, 1: {0, 1}}
    tails_pool = {0: {4, 5}, 1: {6, 7}}
    h2 = np.tile(kg.head_idx, 4)
    t2 = np.tile(kg.tail_idx, 4)
    for i in range(len(nh)):
        if nh[i] != h2[i]:  # head was corrupted -> from the head pool
            assert int(nh[i]) in heads_pool[int(rels[i])]
        if nt[i] != t2[i]:
            assert int(nt[i]) in tails_pool[int(rels[i])]


def test_torus_dissimilarities():
    a = jnp.array([[0.1, 0.9]])
    b = jnp.array([[0.9, 0.1]])
    # |a-b| = 0.8 -> torus distance uses min(0.8, 0.2) = 0.2 per dim
    d1 = float(dissimilarity(a, b, "torus_L1")[0])
    assert abs(d1 - 2 * (0.2 + 0.2)) < 1e-6
    d2 = float(dissimilarity(a, b, "torus_L2")[0])
    assert abs(d2 - 4 * (0.36 + 0.36)) < 1e-5  # min(0.64, 1-0.64)=0.36
    de = float(dissimilarity(a, b, "torus_eL2")[0])
    assert de >= 0


def test_entity_and_relation_inference_topk():
    kg = _kg()
    model = make_kge_model("distmult", kg.n_ent, kg.n_rel, 8)
    params = model.init_params(jax.random.PRNGKey(0))
    ei = EntityInference(model, params, kg.head_idx[:3], kg.relations[:3],
                         top_k=3)
    preds = ei.evaluate()
    assert preds.shape == (3, 3)
    assert (preds < kg.n_ent).all()
    # scores sorted descending
    assert (np.diff(ei.scores, axis=1) <= 1e-6).all()

    ri = RelationInference(model, params, kg.head_idx[:3], kg.tail_idx[:3],
                           top_k=2)
    rpreds = ri.evaluate()
    assert rpreds.shape == (3, 2)
    assert (rpreds < kg.n_rel).all()


def test_inference_dictionary_filtering():
    kg = _kg()
    model = make_kge_model("distmult", kg.n_ent, kg.n_rel, 8)
    params = model.init_params(jax.random.PRNGKey(1))
    banned = {(int(kg.head_idx[0]), int(kg.relations[0])): {0, 1, 2, 3, 4}}
    ei = EntityInference(model, params, kg.head_idx[:1], kg.relations[:1],
                         top_k=3, dictionary=banned)
    preds = ei.evaluate()
    assert not (set(preds[0]) & {0, 1, 2, 3, 4})


def test_duplicate_relations_detected():
    # r0 and r1 share identical (h,t) pairs; r2 is the reverse of r0
    h = np.array([0, 1, 0, 1, 2, 3])
    r = np.array([0, 0, 1, 1, 2, 2])
    t = np.array([2, 3, 2, 3, 0, 1])
    kg = KnowledgeGraph(h, r, t, n_ent=4, n_rel=3)
    dup, rev = duplicates(kg, 0.8, 0.8)
    assert (0, 1) in dup
    assert (0, 2) in rev or (1, 2) in rev


def test_cartesian_product_relations():
    # r0 covers all 4 of {0,1} x {2,3}
    h = np.array([0, 0, 1, 1])
    r = np.zeros(4, int)
    t = np.array([2, 3, 2, 3])
    kg = KnowledgeGraph(h, r, t, n_ent=4, n_rel=1)
    assert cartesian_product_relations(kg) == [0]


def test_submission_packaging(tmp_path):
    import json
    import zipfile

    from item_alignment_tpu.aggregate.submit import (
        package_submission,
        validate_submission,
    )

    result = tmp_path / "deepAI_result.jsonl"
    with open(result, "w") as w:
        w.write(json.dumps({"src_item_id": "a", "src_item_emb": "[0.1]",
                            "tgt_item_id": "b", "tgt_item_emb": "[0.9]",
                            "threshold": 0.4}) + "\n")
    assert validate_submission(str(result))["rows"] == 1
    zpath = package_submission(str(result), str(tmp_path / "result.zip"))
    with zipfile.ZipFile(zpath) as z:
        names = set(z.namelist())
        assert names == {"similarity.py", "deepAI_result.jsonl"}
        src = z.read("similarity.py").decode()
    # the scorer contract: compute returns tgt_item_emb[0]
    ns = {}
    exec(src, ns)
    assert ns["compute"]([0.1], [0.9, 0.2]) == 0.9


def test_crop_largest_detection():
    from item_alignment_tpu.data.images import crop_largest_detection

    img = np.arange(100 * 100 * 3, dtype=np.uint8).reshape(100, 100, 3)
    dets = [(10, 10, 90, 90, "cup", 0.9), (0, 0, 20, 20, "person", 0.99)]
    out = crop_largest_detection(img, dets, class_whitelist=["cup"],
                                 min_crop_ratio=0.1)
    assert out.shape == (80, 80, 3)
    # small box below min ratio -> original returned
    out2 = crop_largest_detection(img, [(0, 0, 10, 10, "cup", 0.9)],
                                  ["cup"], min_crop_ratio=0.1)
    assert out2.shape == (100, 100, 3)
    # non-whitelisted class ignored
    out3 = crop_largest_detection(img, dets, class_whitelist=["shoe"])
    assert out3.shape == (100, 100, 3)
