"""Head behavior: similarity measures, prob mappings, aux-task span pooling."""

import numpy as np
import jax
import jax.numpy as jnp

from item_alignment_tpu.config import ModelConfig
from item_alignment_tpu.models.heads import (
    AuxiliaryPairHead,
    ClsClassificationHead,
    TwoTowerClassificationHead,
    VecSimClassificationHead,
    cosine_similarity,
    inner_product,
    masked_cross_entropy,
    pairwise_distance,
)

RNG = jax.random.PRNGKey(0)


def test_inner_product_normalized_equals_cosine():
    rs = np.random.RandomState(0)
    x = jnp.array(rs.randn(4, 8).astype(np.float32))
    y = jnp.array(rs.randn(4, 8).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(inner_product(x, y, normalize=True)),
        np.asarray(cosine_similarity(x, y)), rtol=1e-5)


def test_pairwise_distance_matches_torch():
    import torch
    rs = np.random.RandomState(1)
    x = rs.randn(4, 8).astype(np.float32)
    y = rs.randn(4, 8).astype(np.float32)
    for p in (1, 2):
        ours = np.asarray(pairwise_distance(jnp.array(x), jnp.array(y), p=p))
        theirs = torch.nn.PairwiseDistance(p=p)(torch.tensor(x), torch.tensor(y)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def _vecsim_probs(sm):
    cfg = ModelConfig(hidden_size=16, similarity_measure=sm)
    head = VecSimClassificationHead(cfg)
    f1 = jnp.ones((3, 16)) * 0.1
    f2 = jnp.ones((3, 16)) * 0.2
    params = head.init(RNG, f1, f2)
    x, y, sim, probs = head.apply(params, f1, f2)
    return np.asarray(sim), np.asarray(probs)


def test_vecsim_prob_mappings():
    sim, probs = _vecsim_probs("cosine")
    np.testing.assert_allclose(probs, (sim + 1) / 2, rtol=1e-5)
    sim, probs = _vecsim_probs("inner_product")
    np.testing.assert_allclose(probs, 1 / (1 + np.exp(-sim)), rtol=1e-5)
    for sm in ("l1", "l2"):
        sim, probs = _vecsim_probs(sm)
        np.testing.assert_allclose(probs, np.exp(-sim), rtol=1e-5)
        assert (sim >= 0).all()


def test_two_tower_head_shapes_and_softmax():
    head = TwoTowerClassificationHead(num_labels=2)
    f = jnp.array(np.random.RandomState(0).randn(5, 12).astype(np.float32))
    params = head.init(RNG, f, f)
    x, y, logits, probs = head.apply(params, f, f)
    assert logits.shape == (5, 2)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), np.ones(5), rtol=1e-6)


def test_cls_head_end_ensemble_uses_images():
    cfg = ModelConfig(hidden_size=16, ensemble="end", image_hidden_size=8)
    head = ClsClassificationHead(cfg)
    feats = jnp.ones((2, 4, 16))
    imgs = (jnp.ones((2, 8)), jnp.ones((2, 8)) * 2)
    params = head.init(RNG, feats, imgs)
    out = head.apply(params, feats, imgs)
    assert out.shape == (2, 2)
    out2 = head.apply(params, feats, (imgs[0] * 3, imgs[1]))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_aux_head_span_mean_matches_manual():
    cfg = ModelConfig(hidden_size=8, num_labels=2, classifier_dropout=0.0)
    head = AuxiliaryPairHead(cfg)
    rs = np.random.RandomState(2)
    seq = jnp.array(rs.randn(1, 10, 8).astype(np.float32))
    # one valid pair: src tokens [1,3), tgt tokens [5,8), label 1; one pad row
    spans = jnp.array([[[1, 3, 5, 8, 1], [-1, -1, -1, -1, -1]]], dtype=jnp.int32)
    params = head.init(RNG, seq, spans)
    logits, labels, valid = head.apply(params, seq, spans)
    assert logits.shape == (1, 2, 2)
    assert bool(valid[0, 0]) and not bool(valid[0, 1])
    assert int(labels[0, 0]) == 1
    # manual: span means through the same dense layer
    w = params["params"]["out_proj"]["kernel"]
    b = params["params"]["out_proj"]["bias"]
    x = np.asarray(seq)[0, 1:3].mean(0)
    y = np.asarray(seq)[0, 5:8].mean(0)
    manual = np.concatenate([x, y]) @ np.asarray(w) + np.asarray(b)
    np.testing.assert_allclose(np.asarray(logits[0, 0]), manual, rtol=1e-4, atol=1e-5)


def test_masked_cross_entropy_ignores_invalid():
    logits = jnp.array([[[2.0, -2.0], [100.0, -100.0]]])
    labels = jnp.array([[0, 1]])
    valid = jnp.array([[True, False]])
    val = float(masked_cross_entropy(logits, labels, valid))
    expected = -np.log(np.exp(2) / (np.exp(2) + np.exp(-2)))
    assert abs(val - expected) < 1e-5
