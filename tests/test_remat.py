"""Remat (gradient checkpointing) path: gradients must match the non-remat
path; memory behavior is exercised on TPU by benchmarks/bench_train.py."""

import numpy as np
import jax
import jax.numpy as jnp

from item_alignment_tpu.config import ModelConfig
from item_alignment_tpu.models.text import RobertaOneTower

TINY = dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, vocab_size=100, max_position_embeddings=64,
            max_seq_len=4, max_seq_len_pv=4, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0)


def test_remat_grads_match_nonremat():
    cfg = ModelConfig(**TINY)
    cfg_r = ModelConfig(remat=True, **TINY)
    model = RobertaOneTower(cfg)
    model_r = RobertaOneTower(cfg_r)

    rs = np.random.RandomState(0)
    ids = jnp.array(rs.randint(1, 100, (2, cfg.pair_seq_len)), jnp.int32)
    mask = jnp.ones_like(ids)
    labels = jnp.array([0, 1])
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, ids, mask,
                                 labels=labels)

    def loss(m):
        return jax.jit(jax.grad(
            lambda p: m.apply(p, ids, mask, labels=labels).loss))(params)

    g1 = loss(model)
    g2 = loss(model_r)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
