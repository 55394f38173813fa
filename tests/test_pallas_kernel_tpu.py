"""Pallas fused-attention kernel numerics — runs only on real TPU.

The CPU suite forces the cpu backend (conftest), where the kernel never
executes; on TPU hardware (run with ``pytest --no-header -p no:cacheprovider
tests/test_pallas_kernel_tpu.py`` WITHOUT the conftest CPU override, e.g.
from a different cwd) these assert the kernel against the XLA path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(jax.default_backend() != "tpu",
                                reason="needs real TPU")


def _inputs(B=2, S=512, N=16, H=64, dtype=jnp.bfloat16, masked=True):
    from item_alignment_tpu.ops.attention import make_attention_bias

    rng = jax.random.PRNGKey(1)
    q, k, v = (jax.random.normal(r, (B, S, N, H), dtype)
               for r in jax.random.split(rng, 3))
    mask = np.ones((B, S), np.int32)
    if masked:
        mask[:, S - 100:] = 0
    return q, k, v, make_attention_bias(jnp.array(mask))


def test_kernel_matches_xla_forward():
    from item_alignment_tpu.ops.attention import dot_product_attention
    from item_alignment_tpu.ops.pallas_attention import fused_attention

    q, k, v, bias = _inputs()
    ref = np.asarray(dot_product_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        bias))
    out = np.asarray(fused_attention(q, k, v, bias)).astype(np.float32)
    assert np.abs(ref - out).max() < 2e-2  # bf16 matmul tolerance


def test_kernel_grads_match_xla():
    from item_alignment_tpu.ops.attention import dot_product_attention
    from item_alignment_tpu.ops.pallas_attention import fused_attention

    q, k, v, bias = _inputs(S=256, N=4, dtype=jnp.float32)

    g1 = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        fused_attention(q, k, v, bias) ** 2), argnums=(0, 1, 2)))(q, k, v)
    g2 = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        dot_product_attention(q, k, v, bias) ** 2), argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g1, g2):
        denom = max(float(jnp.abs(jnp.asarray(b)).max()), 1.0)
        assert float(jnp.abs(a - b).max()) / denom < 2e-2
