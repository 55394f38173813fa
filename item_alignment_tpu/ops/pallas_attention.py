"""Pallas TPU fused attention for the <=512-token pair cross-encoder.

The reference's hot loop is 24 layers of self-attention over 510 tokens
(``finetune_text.py:401-415``).  At S<=512 and head_dim 64, the whole
[S, S] score tile for one (batch, head) fits comfortably in VMEM
(512*512*4B = 1 MiB), so the kernel computes softmax(QK^T/sqrt(d) + bias)V
in a single block per (batch, head) grid cell — no online-softmax tiling
needed, one HBM round-trip for Q/K/V, none for the score matrix.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    # blocks: q/k/v [1, S, H], bias [1, 1, S] (key mask row), o [1, S, H]
    # keep matmul inputs in their native (bf16) dtype so the MXU runs at
    # full rate; accumulate in fp32 via preferred_element_type
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [S, S] fp32
    scores = scores * scale + bias_ref[0].astype(jnp.float32)  # bias bcast [1,S]
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def fused_attention(
    q: jax.Array,  # [B, S, N, H]
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,  # [B, 1, 1, S] additive key-mask bias
) -> jax.Array:
    B, S, N, H = q.shape
    scale = 1.0 / (H ** 0.5)
    qt = q.transpose(0, 2, 1, 3).reshape(B * N, S, H)
    kt = k.transpose(0, 2, 1, 3).reshape(B * N, S, H)
    vt = v.transpose(0, 2, 1, 3).reshape(B * N, S, H)
    if bias is None:
        bias_rows = jnp.zeros((B, 1, S), jnp.float32)
    else:
        bias_rows = bias.reshape(B, 1, S).astype(jnp.float32)

    grid = (B, N)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * N, S, H), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, S, H), lambda b, n: (b * N + n, 0, 0),  # noqa: B023
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, H), lambda b, n: (b * N + n, 0, 0),  # noqa: B023
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, H), lambda b, n: (b * N + n, 0, 0),  # noqa: B023
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), lambda b, n: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, H), lambda b, n: (b * N + n, 0, 0),  # noqa: B023
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * N * S * S * H,
            bytes_accessed=(3 * B * N * S * H + B * N * S * H) * q.dtype.itemsize,
            transcendentals=B * N * S * S,
        ),
    )(qt, kt, vt, bias_rows)
    return out.reshape(B, N, S, H).transpose(0, 2, 1, 3)
