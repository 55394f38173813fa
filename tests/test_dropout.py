"""Replay dropout (ops/dropout.py): the regenerate-don't-save mask scheme
that replaced nn.Dropout at the encoder/embedding hot sites.

Checks the properties the train step depends on:
  * expectation preservation (E[dropout(x)] == x via the effective
    keep probability — the 1/256-quantized rate),
  * the backward regenerates EXACTLY the forward's mask (grad nonzero
    precisely where the output was kept, scaled by 1/keep_p),
  * rate 0 is the identity with a pass-through gradient,
  * the flax wrapper is deterministic-safe and matches nn.Dropout's
    calling convention,
  * a dropout-on encoder train step still differentiates under every
    remat policy (incl. the new "mlp" wide-tensor policy).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from item_alignment_tpu.ops.dropout import ReplayDropout, replay_dropout


def test_replay_dropout_mean_preserving():
    key = jax.random.PRNGKey(7)
    x = jnp.ones((256, 512), jnp.float32)
    y = replay_dropout(0.1, key, x)
    # effective rate is round(0.1*256)/256 = 26/256; inverted dropout
    # rescales by the matching keep prob, so the mean stays ~1.0
    kept = np.asarray(y > 0)
    assert abs(kept.mean() - (1 - 26 / 256)) < 0.01
    assert abs(np.asarray(y).mean() - 1.0) < 0.01
    # kept elements carry exactly the 1/keep_p scale
    np.testing.assert_allclose(np.asarray(y)[kept], 1 / (1 - 26 / 256),
                               rtol=1e-6)


def test_replay_dropout_bwd_regenerates_fwd_mask():
    key = jax.random.PRNGKey(3)
    x = jnp.array(np.random.RandomState(0).randn(64, 128), jnp.float32)

    y, vjp = jax.vjp(lambda t: replay_dropout(0.2, key, t), x)
    (dx,) = vjp(jnp.ones_like(y))
    keep_p = 1 - round(0.2 * 256) / 256
    # gradient mask == forward mask, same scale
    np.testing.assert_allclose(np.asarray(dx != 0), np.asarray(y != 0))
    np.testing.assert_allclose(np.asarray(dx)[np.asarray(dx) != 0],
                               1 / keep_p, rtol=1e-6)


def test_replay_dropout_rate_zero_identity():
    key = jax.random.PRNGKey(0)
    x = jnp.arange(12.0).reshape(3, 4)
    y, vjp = jax.vjp(lambda t: replay_dropout(0.0, key, t), x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    (dx,) = vjp(jnp.ones_like(y))
    np.testing.assert_array_equal(np.asarray(dx), np.ones_like(x))


def test_replay_dropout_dtype_preserved():
    key = jax.random.PRNGKey(1)
    x = jnp.ones((8, 128), jnp.bfloat16)
    y = replay_dropout(0.1, key, x)
    assert y.dtype == jnp.bfloat16
    (dx,) = jax.vjp(lambda t: replay_dropout(0.1, key, t), x)[1](y)
    assert dx.dtype == jnp.bfloat16


def test_flax_wrapper_deterministic_and_training():
    mod = ReplayDropout(0.5)
    x = jnp.ones((4, 64))
    # deterministic: identity, no rng needed
    y = mod.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    # training: needs the "dropout" collection, drops ~half
    y = mod.apply({}, x, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(2)})
    frac = float((np.asarray(y) != 0).mean())
    assert 0.3 < frac < 0.7


@pytest.mark.parametrize("policy", ["dots", "full", "mlp"])
def test_encoder_dropout_trains_under_remat(policy):
    from item_alignment_tpu.config import ModelConfig
    from item_alignment_tpu.models.text import RobertaOneTower

    cfg = ModelConfig(hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=64,
                      vocab_size=100, max_position_embeddings=64,
                      max_seq_len=4, max_seq_len_pv=4,
                      hidden_dropout_prob=0.1,
                      attention_probs_dropout_prob=0.0,
                      remat=True, remat_policy=policy)
    model = RobertaOneTower(cfg)
    rs = np.random.RandomState(0)
    ids = jnp.array(rs.randint(1, 100, (2, cfg.pair_seq_len)), jnp.int32)
    mask = jnp.ones_like(ids)
    labels = jnp.array([0, 1])
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        ids, mask, labels=labels)["params"]

    def loss_fn(p):
        return model.apply({"params": p}, ids, mask, labels=labels,
                           deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(5)}).loss

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))


def test_mlp_remat_policy_grads_match_nonremat():
    """remat_policy='mlp' is a pure memory transform: gradients must be
    identical (deterministic path) to the non-remat encoder."""
    from item_alignment_tpu.config import ModelConfig
    from item_alignment_tpu.models.text import RobertaOneTower

    tiny = dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                intermediate_size=64, vocab_size=100,
                max_position_embeddings=64, max_seq_len=4, max_seq_len_pv=4,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    cfg = ModelConfig(**tiny)
    cfg_r = ModelConfig(remat=True, remat_policy="mlp", **tiny)
    rs = np.random.RandomState(0)
    ids = jnp.array(rs.randint(1, 100, (2, cfg.pair_seq_len)), jnp.int32)
    mask = jnp.ones_like(ids)
    labels = jnp.array([0, 1])
    model = RobertaOneTower(cfg)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, ids,
                                 mask, labels=labels)

    def grads(m):
        return jax.jit(jax.grad(
            lambda p: m.apply(p, ids, mask, labels=labels).loss))(params)

    g1 = jax.tree_util.tree_leaves(grads(model))
    g2 = jax.tree_util.tree_leaves(grads(RobertaOneTower(cfg_r)))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
