"""Multimodal family: RoBERTa+image towers, CoCa blocks and losses."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from item_alignment_tpu.config import ModelConfig
from item_alignment_tpu.models.multimodal import (
    CoCaForItemAlignment,
    CoCaForPretraining,
    CrossAttention,
    ParallelTransformerBlock,
    RobertaImageOneTower,
    RobertaImageTwoTower,
    apply_rotary_pos_emb,
    rotary_freqs,
    swiglu,
)

RNG = jax.random.PRNGKey(0)

TINY = dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, vocab_size=100, max_position_embeddings=128,
            image_hidden_size=24, multimodal_depth=1, coca_heads=4, ff_mult=2,
            image_size=16, patch_size=8)


def test_rotary_identity_at_position_zero():
    pos = rotary_freqs(4, 8)
    t = jnp.ones((1, 4, 8))
    out = apply_rotary_pos_emb(pos, t)
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.ones(8), atol=1e-6)
    # rotation preserves norm
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1),
                               np.linalg.norm(np.asarray(t), axis=-1),
                               rtol=1e-5)


def test_swiglu_matches_reference_formula():
    x = jnp.array(np.random.RandomState(0).randn(2, 8).astype(np.float32))
    a, gate = np.split(np.asarray(x), 2, axis=-1)
    expected = (gate / (1 + np.exp(-gate))) * a
    np.testing.assert_allclose(np.asarray(swiglu(x)), expected, rtol=1e-5)


def test_parallel_block_causal_masking():
    blk = ParallelTransformerBlock(dim=16, dim_head=4, heads=2, ff_mult=2,
                                   is_decoding=True)
    x = jnp.array(np.random.RandomState(1).randn(1, 6, 16).astype(np.float32))
    params = blk.init(RNG, x)
    out1 = blk.apply(params, x)
    # changing future tokens must not affect past outputs under causal mask
    x2 = x.at[:, 4:].set(0.0)
    out2 = blk.apply(params, x2)
    np.testing.assert_allclose(np.asarray(out1[:, :4]), np.asarray(out2[:, :4]),
                               atol=1e-5)


def test_cross_attention_shapes():
    ca = CrossAttention(dim=16, dim_head=4, heads=2, parallel_ff=True, ff_mult=2)
    x = jnp.ones((2, 5, 16))
    ctx = jnp.ones((2, 7, 16))
    params = ca.init(RNG, x, ctx)
    out = ca.apply(params, x, ctx)
    assert out.shape == (2, 5, 16)


def _img_one_tower_inputs(cfg, ensemble):
    B, S = 2, 20
    ids = np.random.RandomState(0).randint(3, 90, (B, S)).astype(np.int32)
    ids[:, 1] = 99  # src [unused99]
    ids[:, 10] = 99
    img_idx = np.full(B, 10, np.int32)
    src_emb = jnp.ones((B, cfg.image_hidden_size))
    tgt_emb = jnp.ones((B, cfg.image_hidden_size)) * 2
    return (jnp.array(ids), src_emb, tgt_emb, jnp.ones((B, S), jnp.int32),
            jnp.array(img_idx))


@pytest.mark.parametrize("ensemble", ["begin", "end"])
def test_roberta_image_one_tower(ensemble):
    cfg = ModelConfig(model_name="roberta_image", ensemble=ensemble,
                      max_seq_len=5, max_seq_len_pv=5, **TINY)
    model = RobertaImageOneTower(cfg)
    ids, src, tgt, mask, img_idx = _img_one_tower_inputs(cfg, ensemble)
    labels = jnp.array([0, 1])
    params = model.init({"params": RNG}, ids, src, tgt, mask,
                        image_indices=img_idx, labels=labels)
    out = model.apply(params, ids, src, tgt, mask, image_indices=img_idx,
                      labels=labels)
    assert np.isfinite(float(out.loss))
    # the image embeddings must influence the output
    out2 = model.apply(params, ids, src * 5, tgt, mask, image_indices=img_idx,
                       labels=labels)
    assert float(out.loss) != float(out2.loss)


def test_roberta_image_two_tower():
    cfg = ModelConfig(model_name="roberta_image", ensemble="begin",
                      interaction_type="two_tower", max_seq_len=5,
                      max_seq_len_pv=5, **TINY)
    model = RobertaImageTwoTower(cfg)
    B, S = 2, 10
    ids = np.random.RandomState(0).randint(3, 90, (B, S)).astype(np.int32)
    ids[:, 1] = 99
    img = jnp.ones((B, cfg.image_hidden_size))
    labels = jnp.array([1, 0])
    params = model.init({"params": RNG}, jnp.array(ids), img, jnp.array(ids),
                        img, labels=labels)
    out = model.apply(params, jnp.array(ids), img, jnp.array(ids), img,
                      labels=labels)
    assert np.isfinite(float(out.loss))


def test_coca_pretraining_loss():
    cfg = ModelConfig(model_name="coca", **TINY)
    model = CoCaForPretraining(cfg)
    B, S = 2, 12
    ids = jnp.array(np.random.RandomState(0).randint(3, 90, (B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    images = jnp.ones((B, cfg.image_size, cfg.image_size, 3))
    params = model.init({"params": RNG}, ids, mask, images=images)
    loss = model.apply(params, ids, mask, images=images)
    assert np.isfinite(float(loss))
    # weight tying: no independent vocab-size output kernel parameter
    flat = jax.tree_util.tree_leaves_with_path(params["params"])
    vocab_kernels = [p for p, v in flat
                     if "logits" in str(p) and getattr(v, "ndim", 0) == 2]
    assert not vocab_kernels


@pytest.mark.parametrize("ensemble", ["sum", "cross_attn"])
def test_coca_item_alignment(ensemble):
    cfg = ModelConfig(model_name="coca", ensemble=ensemble, **TINY)
    model = CoCaForItemAlignment(cfg)
    B, S = 2, 10
    ids = jnp.array(np.random.RandomState(0).randint(3, 90, (B, S)), jnp.int32)
    images = jnp.ones((B, cfg.image_size, cfg.image_size, 3))
    labels = jnp.array([0, 1])
    params = model.init({"params": RNG}, ids, images, ids, images, labels=labels)
    out = model.apply(params, ids, images, ids, images, labels=labels)
    assert np.isfinite(float(out.loss))
    assert out.probs.shape == (B,)
