"""Pair-classification losses.

Functional JAX equivalents of the reference's loss switch
(``src/models/text.py:1400-1409, 1468-1477`` and ``src/models/loss.py``):

- ``ce``:        softmax cross-entropy over 2 logits vs integer label
- ``bce``:       sigmoid BCE on a scalar logit vs {0,1} label
- ``cosine``:    CosineEmbeddingLoss(src_emb, tgt_emb, y in {-1,1})
- ``hinge``:     mean(max(0, margin - y * x)) on a scalar score
- ``euclidean``: mean(x ** y) with y in {-1,1}  (reference
                 ``loss.py:7-68`` literally computes pow(input, target))
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """logits [B, C], labels [B] int."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)
    return jnp.mean(nll)


def bce_with_logits_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Elementwise sigmoid BCE, mean-reduced (torch BCEWithLogitsLoss)."""
    logits = logits.astype(jnp.float32).reshape(-1)
    labels = labels.astype(jnp.float32).reshape(-1)
    # log(1+exp(-|x|)) formulation for stability
    loss = jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)


def cosine_embedding_loss(
    x1: jax.Array, x2: jax.Array, target: jax.Array, margin: float = 0.0
) -> jax.Array:
    """torch.nn.CosineEmbeddingLoss semantics; target in {-1, 1}."""
    x1 = x1.astype(jnp.float32)
    x2 = x2.astype(jnp.float32)
    eps = 1e-8
    cos = jnp.sum(x1 * x2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(x1, axis=-1) * jnp.linalg.norm(x2, axis=-1), eps
    )
    target = target.astype(jnp.float32).reshape(cos.shape)
    pos = 1.0 - cos
    neg = jnp.maximum(0.0, cos - margin)
    return jnp.mean(jnp.where(target > 0, pos, neg))


def hinge_loss(scores: jax.Array, target: jax.Array, margin: float = 1.0) -> jax.Array:
    """Reference ``HingeLoss``: mean(max(0, margin - y*x)), y in {-1,1}."""
    scores = scores.astype(jnp.float32).reshape(-1)
    target = target.astype(jnp.float32).reshape(-1)
    return jnp.mean(jnp.maximum(0.0, margin - scores * target))


def euclidean_distance_loss(scores: jax.Array, target: jax.Array) -> jax.Array:
    """Reference ``EuclideanDistanceLoss``: mean(x ** y), y in {-1,1}."""
    scores = scores.astype(jnp.float32).reshape(-1)
    target = target.astype(jnp.float32).reshape(-1)
    return jnp.mean(jnp.power(scores, target))


def margin_ranking_loss(
    pos_scores: jax.Array, neg_scores: jax.Array, margin: float = 1.0,
    reduction: str = "sum",
) -> jax.Array:
    """torchkge ``MarginLoss`` (MarginRankingLoss with y=1, sum reduction;
    reference ``torchkge/utils/losses.py:12-46``): sum(max(0, margin - pos + neg))."""
    loss = jnp.maximum(0.0, margin - pos_scores + neg_scores)
    return jnp.sum(loss) if reduction == "sum" else jnp.mean(loss)


def pair_loss(
    loss_type: str,
    logits: jax.Array,
    probs: jax.Array,
    labels: jax.Array,
    src_embeds: Optional[jax.Array] = None,
    tgt_embeds: Optional[jax.Array] = None,
    margin: float = 0.0,
    num_labels: int = 2,
) -> jax.Array:
    """The reference's loss dispatch (``text.py:1468-1477``).

    - cosine:          loss(src_emb, tgt_emb, 2*labels-1)
    - ce:              CE(logits [B,2], labels)
    - hinge/euclidean: loss(logits.flat, 2*labels-1)
    - bce (default):   BCEWithLogits(logits.flat, labels.flat)
    """
    if loss_type == "cosine":
        return cosine_embedding_loss(src_embeds, tgt_embeds, labels * 2 - 1, margin)
    if loss_type == "ce":
        return cross_entropy_loss(logits.reshape(-1, num_labels), labels.reshape(-1))
    if loss_type == "hinge":
        return hinge_loss(logits, labels * 2 - 1, margin)
    if loss_type == "euclidean":
        return euclidean_distance_loss(logits, labels * 2 - 1)
    return bce_with_logits_loss(logits, labels)
