"""KGE subsystem: score parity vs the vendored torchkge (oracle), sampler
statistics, end-to-end link-prediction improvement on a toy KG."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from item_alignment_tpu.kge.graph import KnowledgeGraph, load_ccks
from item_alignment_tpu.kge.models import make_kge_model
from item_alignment_tpu.kge.sampling import BernoulliNegativeSampler, bernoulli_probs
from item_alignment_tpu.kge.train import KGETrainer
from item_alignment_tpu.kge.evaluation import (
    LinkPredictionEvaluator,
    TripletClassificationEvaluator,
)

REF = "/root/reference"


def toy_kg(n_ent=30, n_rel=4, n_facts=120, seed=0):
    rs = np.random.RandomState(seed)
    h = rs.randint(0, n_ent, n_facts)
    r = rs.randint(0, n_rel, n_facts)
    # structured tails so the model can learn: t = (h + r + 1) % n_ent
    t = (h + r + 1) % n_ent
    return KnowledgeGraph(h, r, t, n_ent, n_rel)


@pytest.mark.skipif(not os.path.isdir(REF), reason="no reference")
@pytest.mark.parametrize("name", ["transe", "pkgm", "distmult", "complex"])
def test_score_parity_vs_torchkge(name):
    import torch
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from torchkge.torchkge.models.translation import TransEModel, PKGMModel
    from torchkge.torchkge.models.bilinear import DistMultModel, ComplExModel

    n_ent, n_rel, dim, B = 20, 5, 16, 8
    model = make_kge_model(name, n_ent, n_rel, dim)
    params = model.init_params(jax.random.PRNGKey(0))

    rs = np.random.RandomState(1)
    h = rs.randint(0, n_ent, B)
    r = rs.randint(0, n_rel, B)
    t = rs.randint(0, n_ent, B)

    if name == "transe":
        ref = TransEModel(dim, n_ent, n_rel, dissimilarity_type="L2")
        ref.ent_emb.weight.data = torch.tensor(np.asarray(params["ent_emb"]))
        ref.rel_emb.weight.data = torch.tensor(np.asarray(params["rel_emb"]))
    elif name == "pkgm":
        ref = PKGMModel(dim, n_ent, n_rel, dissimilarity_type="L2")
        ref.ent_emb.weight.data = torch.tensor(np.asarray(params["ent_emb"]))
        ref.rel_emb.weight.data = torch.tensor(np.asarray(params["rel_emb"]))
        ref.proj_mat.weight.data = torch.tensor(np.asarray(params["proj_mat"]))
    elif name == "distmult":
        ref = DistMultModel(dim, n_ent, n_rel)
        ref.ent_emb.weight.data = torch.tensor(np.asarray(params["ent_emb"]))
        ref.rel_emb.weight.data = torch.tensor(np.asarray(params["rel_emb"]))
    else:
        ref = ComplExModel(dim, n_ent, n_rel)
        ref.re_ent_emb.weight.data = torch.tensor(np.asarray(params["ent_emb"]))
        ref.im_ent_emb.weight.data = torch.tensor(np.asarray(params["ent_emb_im"]))
        ref.re_rel_emb.weight.data = torch.tensor(np.asarray(params["rel_emb"]))
        ref.im_rel_emb.weight.data = torch.tensor(np.asarray(params["rel_emb_im"]))

    ours = np.asarray(model.score(params, jnp.array(h), jnp.array(r), jnp.array(t)))
    with torch.no_grad():
        theirs = ref.scoring_function(torch.tensor(h), torch.tensor(t),
                                      torch.tensor(r)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not os.path.isdir(REF), reason="no reference")
def test_all_candidate_scores_match_pointwise():
    """Matmul-expanded LP scoring must equal pointwise scoring."""
    for name in ("transe", "pkgm", "distmult", "complex"):
        model = make_kge_model(name, 25, 4, 8)
        params = model.init_params(jax.random.PRNGKey(2))
        h = jnp.array([1, 5, 7])
        r = jnp.array([0, 2, 3])
        fast = np.asarray(model.scores_all_tails(params, h, r))
        slow = np.asarray(model._chunked_tails(params, h, r, chunk=16))
        np.testing.assert_allclose(fast, slow, rtol=2e-3, atol=2e-4,
                                   err_msg=name)


def test_all_candidate_head_scores_match_pointwise():
    """Head-side matmul expansion must equal chunked pointwise scoring.
    The pkgm expansion is additionally checked on an UNNORMALIZED entity
    table (score() l2-normalizes the head candidate in both pkgm terms;
    the expansion must too — transe's expansion intentionally uses the raw
    table like torchkge's inference path, so it is checked on unit rows)."""
    for name in ("transe", "pkgm", "distmult", "complex"):
        model = make_kge_model(name, 25, 4, 8)
        params = model.init_params(jax.random.PRNGKey(3))
        if name == "pkgm":  # break the unit-norm invariant on purpose
            params["ent_emb"] = params["ent_emb"] * jnp.linspace(
                0.5, 2.0, 25)[:, None]
        t = jnp.array([2, 9, 11])
        r = jnp.array([1, 0, 3])
        fast = np.asarray(model.scores_all_heads(params, t, r))
        slow = np.asarray(model._chunked_heads(params, t, r, chunk=16))
        np.testing.assert_allclose(fast, slow, rtol=2e-3, atol=2e-4,
                                   err_msg=name)


def test_bernoulli_probs_match_tph_hpt():
    kg = KnowledgeGraph(np.array([0, 1, 2, 0]), np.array([0, 0, 0, 1]),
                        np.array([3, 3, 4, 5]), n_ent=6, n_rel=2)
    probs = bernoulli_probs(kg)
    # rel 0: heads {0,1,2} tails {3,3,4}: tph per head = 1 each -> tph=1;
    # hpt: tail 3 has 2 heads, tail 4 has 1 -> hpt=1.5 -> p=1/(1+1.5)=0.4
    assert abs(probs[0] - 0.4) < 1e-6
    assert abs(probs[1] - 0.5) < 1e-6


def test_corrupt_batch_changes_exactly_one_side():
    kg = toy_kg()
    sampler = BernoulliNegativeSampler(kg, n_neg=2)
    nh, nt = sampler.corrupt_batch(jax.random.PRNGKey(0),
                                   kg.head_idx, kg.tail_idx, kg.relations)
    h2 = np.tile(kg.head_idx, 2)
    t2 = np.tile(kg.tail_idx, 2)
    nh, nt = np.asarray(nh), np.asarray(nt)
    assert nh.shape[0] == 2 * kg.n_facts
    head_kept = nh == h2
    tail_kept = nt == t2
    # each sample keeps at least one side (the corrupted side may collide
    # by chance, so "exactly one changed" holds only in expectation)
    assert np.all(head_kept | tail_kept)
    assert 0.2 < head_kept.mean() < 0.8


def test_split_kg_keeps_all_entities_in_train():
    kg = toy_kg(n_facts=200)
    train, test = kg.split_kg(share=0.7, seed=1)
    assert train.n_facts + test.n_facts == kg.n_facts
    seen = set(train.head_idx) | set(train.tail_idx)
    used = set(kg.head_idx) | set(kg.tail_idx)
    assert used <= seen
    assert set(kg.relations) <= set(train.relations)


def test_load_ccks_roundtrip(tmp_path):
    ents = {"/item/a": 0, "/item/b": 1, "/value/x": 2}
    rels = {"[PAD]": 0, "brand": 1}
    with open(tmp_path / "entity2id.txt", "w") as w:
        for k, v in ents.items():
            w.write(f"{k}\t{v}\n")
    with open(tmp_path / "relation2id.txt", "w") as w:
        for k, v in rels.items():
            w.write(f"{k}\t{v}\n")
    with open(tmp_path / "train2id.txt", "w") as w:
        w.write("/item/a\tbrand\t/value/x\n/item/b\tbrand\t/value/x\n")
    (kg,) = load_ccks(str(tmp_path))
    assert kg.n_facts == 2 and kg.n_ent == 3 and kg.n_rel == 2
    np.testing.assert_array_equal(kg.relations, [1, 1])


def test_kge_end_to_end_learns():
    kg = toy_kg(n_facts=200)
    train, test = kg.split_kg(share=0.8, seed=0)
    model = make_kge_model("transe", kg.n_ent, kg.n_rel, 16)
    trainer = KGETrainer(model, train, n_neg=2, batch_size=64, n_epochs=40,
                         learning_rate=5e-2, margin=1.0)
    before = LinkPredictionEvaluator(model, trainer.params, test,
                                     kg_filter=(train, test)).evaluate()
    result = trainer.run()
    after = LinkPredictionEvaluator(model, result["params"], test,
                                    kg_filter=(train, test)).evaluate()
    assert after.hit_at_k(10)[1] > before.hit_at_k(10)[1]
    assert after.mean_rank()[1] < before.mean_rank()[1]


def test_triplet_classification_runs():
    kg = toy_kg(n_facts=150)
    train, test = kg.split_kg(share=0.8, seed=3)
    model = make_kge_model("distmult", kg.n_ent, kg.n_rel, 8)
    params = model.init_params(jax.random.PRNGKey(0))
    ev = TripletClassificationEvaluator(model, params, train, test)
    acc = ev.accuracy()
    assert 0.0 <= acc <= 1.0
