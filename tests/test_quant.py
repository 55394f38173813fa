"""Int8 inference path (ops/quant.py + encoder QuantDense).

The knob must (a) be numerically faithful — dynamic per-token x
per-channel symmetric quantization keeps the dense outputs within ~1% —
(b) leave the param tree identical to the fp32 model so finetuned
checkpoints load unchanged, and (c) preserve the classifier's decisions
end-to-end on a trained-scale logit gap."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from item_alignment_tpu.config import ModelConfig
from item_alignment_tpu.models import RobertaOneTower
from item_alignment_tpu.ops.quant import int8_matmul


def test_int8_matmul_close_to_fp32():
    rng = np.random.RandomState(0)
    x = jnp.array(rng.randn(8, 64).astype(np.float32))
    w = jnp.array(rng.randn(64, 32).astype(np.float32))
    b = jnp.array(rng.randn(32).astype(np.float32))
    exact = x @ w + b
    quant = int8_matmul(x, w, b)
    # symmetric 127-level quantization of BOTH operands: worst-case
    # relative error ~(1/127)*sqrt(2) per element before accumulation
    err = float(jnp.max(jnp.abs(quant - exact)))
    scale = float(jnp.max(jnp.abs(exact)))
    assert err < 0.03 * scale, (err, scale)


def test_int8_matmul_handles_zero_rows():
    # all-zero rows (padding tokens) must not divide by zero
    x = jnp.zeros((4, 16), jnp.float32)
    w = jnp.ones((16, 8), jnp.float32)
    out = int8_matmul(x, w)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def _tiny_cfg(**kw):
    return ModelConfig(hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=128,
                       vocab_size=100, max_seq_len=8, max_seq_len_pv=8,
                       max_position_embeddings=64,
                       hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0, **kw)


@pytest.fixture(scope="module")
def parity_setup():
    cfg = _tiny_cfg()
    model = RobertaOneTower(cfg)
    rng = np.random.RandomState(1)
    B, S = 8, cfg.pair_seq_len
    ids = jnp.array(rng.randint(3, 100, (B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, ids, mask)
    return cfg, params, ids, mask


def test_quant_param_tree_matches_fp32(parity_setup):
    cfg, params, ids, mask = parity_setup
    qmodel = RobertaOneTower(_tiny_cfg(quant="int8"))
    qparams = jax.jit(qmodel.init)({"params": jax.random.PRNGKey(0)},
                                   ids, mask)
    ref = jax.tree_util.tree_structure(params)
    assert jax.tree_util.tree_structure(qparams) == ref
    shapes = jax.tree_util.tree_map(lambda a, b: a.shape == b.shape,
                                    params, qparams)
    assert all(jax.tree_util.tree_leaves(shapes))


def test_quant_probs_track_fp32(parity_setup):
    cfg, params, ids, mask = parity_setup
    fp = RobertaOneTower(cfg)
    q = RobertaOneTower(_tiny_cfg(quant="int8"))
    p_fp = np.asarray(jax.jit(lambda p: fp.apply(p, ids, mask).probs)(params))
    p_q = np.asarray(jax.jit(lambda p: q.apply(p, ids, mask).probs)(params))
    # randomly-initialized logits sit near zero, so compare probabilities
    # directly: per-layer quantization noise must stay a small perturbation
    np.testing.assert_allclose(p_q, p_fp, atol=0.05)


def test_quant_preserves_trained_decisions(parity_setup):
    """Drive a short training run in fp32, then check the int8 path keeps
    every decision at a trained-scale logit gap (the real deployment
    contract: quantize AFTER finetuning)."""
    import optax

    cfg, params, ids, mask = parity_setup
    fp = RobertaOneTower(cfg)
    q = RobertaOneTower(_tiny_cfg(quant="int8"))
    labels = jnp.array([0, 1] * 4, jnp.int32)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(
            lambda p: fp.apply(p, ids, mask, labels=labels).loss)(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s, loss

    for _ in range(40):
        params, opt, loss = step(params, opt)
    p_fp = np.asarray(fp.apply(params, ids, mask).probs)
    p_q = np.asarray(q.apply(params, ids, mask).probs)
    assert ((p_fp > 0.5) == np.asarray(labels).astype(bool)).all()
    assert ((p_q > 0.5) == (p_fp > 0.5)).all()
    np.testing.assert_allclose(p_q, p_fp, atol=0.1)
