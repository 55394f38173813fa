"""Numerical parity of loss functions vs torch (the reference's substrate)."""

import numpy as np
import pytest

import jax.numpy as jnp

from item_alignment_tpu.models import losses as L

torch = pytest.importorskip("torch")


def test_cross_entropy_matches_torch():
    logits = np.random.RandomState(0).randn(8, 2).astype(np.float32)
    labels = np.array([0, 1, 1, 0, 1, 0, 0, 1])
    ours = float(L.cross_entropy_loss(jnp.array(logits), jnp.array(labels)))
    theirs = float(torch.nn.CrossEntropyLoss()(torch.tensor(logits), torch.tensor(labels)))
    assert abs(ours - theirs) < 1e-4


def test_bce_matches_torch():
    logits = np.random.RandomState(1).randn(8).astype(np.float32)
    labels = np.array([0, 1, 1, 0, 1, 0, 0, 1], dtype=np.float32)
    ours = float(L.bce_with_logits_loss(jnp.array(logits), jnp.array(labels)))
    theirs = float(torch.nn.BCEWithLogitsLoss()(torch.tensor(logits), torch.tensor(labels)))
    assert abs(ours - theirs) < 1e-4


def test_cosine_embedding_matches_torch():
    rs = np.random.RandomState(2)
    x1 = rs.randn(8, 16).astype(np.float32)
    x2 = rs.randn(8, 16).astype(np.float32)
    y = np.array([1, -1, 1, -1, 1, 1, -1, -1], dtype=np.float32)
    for margin in (0.0, 0.3):
        ours = float(L.cosine_embedding_loss(jnp.array(x1), jnp.array(x2), jnp.array(y), margin))
        theirs = float(torch.nn.CosineEmbeddingLoss(margin=margin)(
            torch.tensor(x1), torch.tensor(x2), torch.tensor(y)))
        assert abs(ours - theirs) < 1e-4


def test_hinge_matches_reference_formula():
    # reference loss.py:71-134: mean(max(0, margin - x*y))
    rs = np.random.RandomState(3)
    x = rs.randn(8).astype(np.float32)
    y = np.array([1, -1, 1, -1, 1, 1, -1, -1], dtype=np.float32)
    ours = float(L.hinge_loss(jnp.array(x), jnp.array(y), margin=1.0))
    expected = np.maximum(0.0, 1.0 - x * y).mean()
    assert abs(ours - expected) < 1e-4


def test_euclidean_matches_reference_formula():
    # reference loss.py:7-68: mean(pow(x, y))
    rs = np.random.RandomState(4)
    x = np.abs(rs.randn(8).astype(np.float32)) + 0.1
    y = np.array([1, -1, 1, -1, 1, 1, -1, -1], dtype=np.float32)
    ours = float(L.euclidean_distance_loss(jnp.array(x), jnp.array(y)))
    expected = np.power(x, y).mean()
    assert abs(ours - expected) < 1e-4


def test_margin_ranking_matches_torch():
    rs = np.random.RandomState(5)
    pos = rs.randn(16).astype(np.float32)
    neg = rs.randn(16).astype(np.float32)
    ours = float(L.margin_ranking_loss(jnp.array(pos), jnp.array(neg), margin=0.5))
    theirs = float(torch.nn.MarginRankingLoss(margin=0.5, reduction="sum")(
        torch.tensor(pos), torch.tensor(neg), torch.ones(16)))
    assert abs(ours - theirs) < 1e-4


def test_pair_loss_dispatch():
    logits2 = jnp.array([[0.2, 0.8], [0.9, 0.1]])
    labels = jnp.array([1, 0])
    probs = jnp.array([0.6, 0.4])
    emb = jnp.ones((2, 4))
    for lt in ("ce", "bce", "cosine", "hinge", "euclidean"):
        lg = logits2 if lt == "ce" else probs
        val = L.pair_loss(lt, lg, probs, labels, emb, emb, margin=0.5)
        assert np.isfinite(float(val)), lt
