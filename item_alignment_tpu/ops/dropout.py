"""Replay dropout: inverted dropout whose backward REGENERATES the keep
mask from the forward's PRNG key instead of saving it.

Motivation (measured on v5e, flagship RoBERTa-large train step, bs 16):
``flax.linen.nn.Dropout`` draws a uniform fp32 per element (32 random bits
+ a float convert) and its autodiff saves the keep mask as a residual, so
every one of the encoder's 49 hidden-dropout sites costs a 4-byte/elem
draw in the forward plus a 1-byte/elem mask round-trip through HBM for the
backward.  ``bench_fwd_split.py`` put the hidden-dropout forward tax at
+14.2 ms (52.1% -> 40.9% MFU).

This op instead
  * draws ONE uint8 per element and compares against a precomputed
    threshold (same scheme as the in-kernel attention dropout,
    ``ops/pallas_attention.py::_dropout_consts`` — the effective rate is
    quantized to 1/256, and the inverted-dropout rescale uses the
    effective keep probability so ``E[dropout(x)] == x`` exactly), and
  * saves only the PRNG key: the backward re-draws the identical mask
    (JAX PRNGs are counter-based and deterministic per (key, shape)), so
    no mask bytes ever hit HBM as residuals.

Replaces the torch ``nn.Dropout`` sites inside the reference encoder's
hot loop (``finetune_text.py:401-415`` via HF ``RobertaEncoder``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn


def _consts(rate: float):
    """Static (threshold, effective keep probability) for uint8 draws."""
    t = int(round(rate * 256.0))
    return t, 1.0 - t / 256.0


def _keep(key, shape, threshold: int):
    return jax.random.bits(key, shape, dtype=jnp.uint8) >= jnp.uint8(threshold)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def replay_dropout(rate: float, key, x):
    """Inverted dropout with a regenerate-don't-save backward.

    ``rate`` is static; ``key`` is a JAX PRNG key (any impl — the default
    trainer passes rbg keys so draws use the TPU hardware RNG).  The
    forward and backward derive the SAME mask from (key, x.shape).
    """
    t, keep_p = _consts(rate)
    if t == 0:
        return x
    scale = jnp.asarray(1.0 / keep_p, x.dtype)
    return jnp.where(_keep(key, x.shape, t), x * scale, 0)


def _fwd(rate, key, x):
    return replay_dropout(rate, key, x), (key,)


def _bwd(rate, res, g):
    (key,) = res
    t, keep_p = _consts(rate)
    if t == 0:
        return None, g
    scale = jnp.asarray(1.0 / keep_p, g.dtype)
    return None, jnp.where(_keep(key, g.shape, t), g * scale, 0)


replay_dropout.defvjp(_fwd, _bwd)


class ReplayDropout(nn.Module):
    """Drop-in for ``nn.Dropout`` on large activations (uses the "dropout"
    rng collection like flax's).  Prefer it wherever the mask tensor is
    big enough that the saved-residual HBM traffic matters (the encoder's
    [B, S, H] streams); for tiny head/classifier tensors ``nn.Dropout``
    is equivalent."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        return replay_dropout(self.rate, self.make_rng("dropout"), x)
