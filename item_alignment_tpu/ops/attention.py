"""Attention ops.

`dot_product_attention` is the XLA-fused reference path (works on any
backend); `flash_attention` dispatches to a Pallas TPU kernel for the
512-token cross-encoder hot loop (reference hot path:
``finetune_text.py:401-415`` → 24x self-attention over 510 tokens).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # matches BERT-style additive masking ((1-mask)*-10000 in HF)


def make_attention_bias(attention_mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[B, S] {0,1} key mask -> [B, 1, 1, S] additive bias."""
    bias = (1.0 - attention_mask.astype(dtype)) * NEG_INF
    return bias[:, None, None, :]


def dot_product_attention(
    q: jax.Array,  # [B, S, N, H]
    k: jax.Array,  # [B, T, N, H]
    v: jax.Array,  # [B, T, N, H]
    bias: Optional[jax.Array] = None,  # [B, 1|N, 1|S, T] additive
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Plain masked multi-head attention; XLA fuses the softmax chain."""
    depth = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(depth, dtype=jnp.float32))
    # [B, N, S, T]
    scores = jnp.einsum("bsnh,btnh->bnst", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep.astype(dtype) / (1.0 - dropout_rate)
    return jnp.einsum("bnst,btnh->bsnh", probs, v)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Fused attention. On TPU both the inference (no-dropout) path and the
    training path run Pallas kernels; training regenerates the dropout mask
    in-kernel on both the forward and backward passes (same PRNG seeding),
    so dropout>0 no longer falls back to XLA attention."""
    if jax.default_backend() != "tpu":
        return dot_product_attention(q, k, v, bias, dropout_rate, dropout_rng,
                                     dtype)
    if dropout_rate > 0.0 and dropout_rng is not None:
        try:
            seed = jax.random.bits(dropout_rng, dtype=jnp.uint32).astype(jnp.int32)
            if q.shape[1] > 512:
                # blocked training path: online-softmax fwd + two-kernel
                # blocked bwd with per-tile in-kernel dropout
                from item_alignment_tpu.ops.pallas_attention import (
                    fused_attention_blockwise_dropout,
                )
                return fused_attention_blockwise_dropout(
                    float(dropout_rate), seed, q, k, v, bias).astype(dtype)
            from item_alignment_tpu.ops.pallas_attention import (
                fused_attention_dropout,
            )
            return fused_attention_dropout(
                float(dropout_rate), seed, q, k, v, bias).astype(dtype)
        except Exception as e:  # pragma: no cover - TPU-only fallback
            _warn_fallback_once(e)
            return dot_product_attention(q, k, v, bias, dropout_rate,
                                         dropout_rng, dtype)
    try:
        if q.shape[1] > 512:
            # [S, S] score tiles stop fitting VMEM: swap in the block-wise
            # online-softmax kernel (SURVEY §5.7 swappability)
            from item_alignment_tpu.ops.pallas_attention import (
                fused_attention_blockwise,
            )
            return fused_attention_blockwise(q, k, v, bias).astype(dtype)
        from item_alignment_tpu.ops.pallas_attention import fused_attention
        return fused_attention(q, k, v, bias).astype(dtype)
    except Exception as e:  # pragma: no cover - TPU-only fallback
        _warn_fallback_once(e)
        return dot_product_attention(q, k, v, bias, dtype=dtype)


_warned_fallback = False


def _warn_fallback_once(exc: Exception) -> None:
    """The Pallas kernel failing is a real regression signal — surface it
    (once) instead of silently masking it with the XLA path."""
    global _warned_fallback
    if not _warned_fallback:
        _warned_fallback = True
        import logging

        logging.getLogger("item_alignment_tpu").warning(
            "Pallas fused attention failed (%s: %s); falling back to XLA "
            "attention for this and subsequent calls' shapes.",
            type(exc).__name__, exc)
