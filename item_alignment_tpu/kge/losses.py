"""KGE losses (torchkge ``utils/losses.py:12-122``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from item_alignment_tpu.models.losses import margin_ranking_loss  # noqa: F401


def logistic_loss(pos_scores: jax.Array, neg_scores: jax.Array) -> jax.Array:
    """mean(softplus(-pos)) + mean(softplus(neg)) (LogisticLoss)."""
    return jnp.mean(jax.nn.softplus(-pos_scores)) + jnp.mean(jax.nn.softplus(neg_scores))


def binary_cross_entropy_loss(pos_scores: jax.Array, neg_scores: jax.Array
                              ) -> jax.Array:
    """BCE on sigmoid(score): positives -> 1, negatives -> 0."""
    eps = 1e-7
    p = jnp.clip(jax.nn.sigmoid(pos_scores), eps, 1 - eps)
    n = jnp.clip(jax.nn.sigmoid(neg_scores), eps, 1 - eps)
    return -(jnp.mean(jnp.log(p)) + jnp.mean(jnp.log(1 - n)))


def kge_loss(kind: str, pos, neg, margin: float = 1.0) -> jax.Array:
    if kind == "margin":
        return margin_ranking_loss(pos, neg, margin)
    if kind == "logistic":
        return logistic_loss(pos, neg)
    if kind == "bce":
        return binary_cross_entropy_loss(pos, neg)
    raise ValueError(f"unknown kge loss {kind}")
