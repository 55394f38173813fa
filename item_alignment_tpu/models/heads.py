"""Pair-classification heads (Flax Linen).

Re-designs of the reference heads in ``src/models/base.py``:

- ``inner_product``            <- InnerProduct (base.py:10-34)
- ``VecSimClassificationHead`` <- base.py:37-88
- ``TwoTowerClassificationHead`` <- base.py:91-117
- ``ClsClassificationHead``    <- RobertaClassificationHead (base.py:120-157)
- ``AuxiliaryPairHead``        <- AuxiliaryTaskPair (text.py:66-102), re-expressed
  as a fixed-size masked span-pool (no python loops, jit-static shapes).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from item_alignment_tpu.config import ModelConfig


def inner_product(x1: jax.Array, x2: jax.Array, normalize: bool = False) -> jax.Array:
    if normalize:
        x1 = x1 / jnp.maximum(jnp.linalg.norm(x1, axis=-1, keepdims=True), 1e-12)
        x2 = x2 / jnp.maximum(jnp.linalg.norm(x2, axis=-1, keepdims=True), 1e-12)
    return jnp.sum(x1 * x2, axis=-1)


def cosine_similarity(x1: jax.Array, x2: jax.Array, eps: float = 1e-8) -> jax.Array:
    denom = jnp.maximum(
        jnp.linalg.norm(x1, axis=-1) * jnp.linalg.norm(x2, axis=-1), eps
    )
    return jnp.sum(x1 * x2, axis=-1) / denom


def pairwise_distance(x1: jax.Array, x2: jax.Array, p: int, eps: float = 1e-6) -> jax.Array:
    # torch.nn.PairwiseDistance adds eps to the difference
    d = jnp.abs(x1 - x2 + eps)
    if p == 1:
        return jnp.sum(d, axis=-1)
    return jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 0.0))


class VecSimClassificationHead(nn.Module):
    """Shared dense+tanh on two summary vectors, then a similarity score.

    probs: inner_product -> sigmoid(sim); cosine -> (sim+1)/2; l1/l2 -> exp(-sim).
    (reference ``base.py:66-88``)
    """

    config: ModelConfig

    @nn.compact
    def __call__(self, features_1, features_2, deterministic: bool = True):
        cfg = self.config
        drop = cfg.classifier_dropout if cfg.classifier_dropout is not None else cfg.hidden_dropout_prob
        dense = nn.Dense(cfg.hidden_size, name="dense")
        dropout = nn.Dropout(drop)

        def proj(f):
            x = dropout(f, deterministic=deterministic)
            x = jnp.tanh(dense(x))
            return dropout(x, deterministic=deterministic)

        x, y = proj(features_1), proj(features_2)
        sm = cfg.similarity_measure
        if sm == "inner_product":
            sim = inner_product(x, y)
            probs = jax.nn.sigmoid(sim)
        elif sm == "cosine":
            sim = cosine_similarity(x, y)
            probs = (sim + 1.0) / 2.0
        elif sm == "l1":
            sim = pairwise_distance(x, y, p=1)
            probs = jnp.exp(-sim)
        elif sm == "l2":
            sim = pairwise_distance(x, y, p=2)
            probs = jnp.exp(-sim)
        else:
            raise ValueError(f"Unsupported similarity measure: {sm}")
        return x, y, sim, probs


class TwoTowerClassificationHead(nn.Module):
    """concat(two tower outputs) -> Linear(2F -> num_labels) -> softmax."""

    dropout_rate: float = 0.0
    num_labels: int = 2

    @nn.compact
    def __call__(self, features_1, features_2, deterministic: bool = True):
        dropout = nn.Dropout(self.dropout_rate)
        x = dropout(features_1, deterministic=deterministic)
        y = dropout(features_2, deterministic=deterministic)
        logits = nn.Dense(self.num_labels, name="out_proj")(
            jnp.concatenate((x, y), axis=-1)
        )
        probs = jax.nn.softmax(logits, axis=-1)
        return x, y, logits, probs


class ClsClassificationHead(nn.Module):
    """[CLS] -> dropout -> dense -> tanh -> dropout -> out_proj.

    With ``ensemble == "end"`` the two raw image embeddings are projected and
    concatenated before ``out_proj`` (reference ``base.py:133-153``).
    """

    config: ModelConfig

    @nn.compact
    def __call__(self, features, image_embeds: Optional[Tuple[jax.Array, jax.Array]] = None,
                 deterministic: bool = True):
        cfg = self.config
        drop = cfg.classifier_dropout if cfg.classifier_dropout is not None else cfg.hidden_dropout_prob
        dropout = nn.Dropout(drop)
        x = features[:, 0, :]  # [CLS]
        x = dropout(x, deterministic=deterministic)
        x = jnp.tanh(nn.Dense(cfg.hidden_size, name="dense")(x))
        x = dropout(x, deterministic=deterministic)
        if cfg.ensemble == "end":
            y = jnp.concatenate(image_embeds, axis=-1)
            y = dropout(y, deterministic=deterministic)
            y = jnp.tanh(nn.Dense(cfg.hidden_size, name="dense_img")(y))
            y = dropout(y, deterministic=deterministic)
            x = nn.Dense(cfg.num_labels, name="out_proj")(
                jnp.concatenate((x, y), axis=-1)
            )
        else:
            x = nn.Dense(cfg.num_labels, name="out_proj")(x)
        return x


class AuxiliaryPairHead(nn.Module):
    """Auxiliary aligned-pv-pair task, vectorized.

    The reference (``text.py:66-102``) python-loops over ragged
    ``pair_indices``; here spans arrive as a fixed-size int32 tensor
    ``pair_spans [B, P, 5]`` = (src_start, src_end, tgt_start, tgt_end, label),
    padded with -1 rows.  Span mean-pools become one masked matmul.
    Returns (logits [B,P,C], labels [B,P], valid [B,P]).
    """

    config: ModelConfig

    @nn.compact
    def __call__(self, sequence_output: jax.Array, pair_spans: jax.Array,
                 deterministic: bool = True):
        cfg = self.config
        B, S, _ = sequence_output.shape
        drop = cfg.classifier_dropout if cfg.classifier_dropout is not None else cfg.hidden_dropout_prob
        dropout = nn.Dropout(drop)

        t = jnp.arange(S)[None, None, :]  # [1,1,S]

        def span_mean(starts, ends):
            w = ((t >= starts[..., None]) & (t < ends[..., None])).astype(jnp.float32)
            width = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
            return jnp.einsum("bps,bsh->bph", w / width,
                              sequence_output.astype(jnp.float32))

        x = span_mean(pair_spans[..., 0], pair_spans[..., 1])
        y = span_mean(pair_spans[..., 2], pair_spans[..., 3])
        x = dropout(x, deterministic=deterministic)
        y = dropout(y, deterministic=deterministic)
        logits = nn.Dense(cfg.num_labels, name="out_proj")(
            jnp.concatenate((x, y), axis=-1)
        )
        labels = jnp.maximum(pair_spans[..., 4], 0)
        valid = pair_spans[..., 0] >= 0
        return logits, labels, valid


def masked_cross_entropy(logits: jax.Array, labels: jax.Array, valid: jax.Array) -> jax.Array:
    """Mean CE over valid entries (0 if none valid)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    v = valid.astype(jnp.float32)
    return jnp.sum(nll * v) / jnp.maximum(jnp.sum(v), 1.0)
