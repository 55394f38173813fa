"""timm ViT checkpoint conversion: exact shape contract + functional load.

Numerics vs timm can't be checked in this image (timm not installed), but
the attention mapping IS verified numerically: a manual torch-free
re-implementation of timm's fused-qkv attention must match our
MultiHeadDotProductAttention given converted weights.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from item_alignment_tpu.models.image import ViT
from item_alignment_tpu.utils.timm_import import convert_timm_vit, load_timm_vit


def fake_timm_sd(depth=2, dim=32, heads=4, patch=8, n_patches=16, seed=0):
    rs = np.random.RandomState(seed)
    sd = {
        "cls_token": rs.randn(1, 1, dim).astype(np.float32),
        "pos_embed": rs.randn(1, n_patches + 1, dim).astype(np.float32),
        "patch_embed.proj.weight": rs.randn(dim, 3, patch, patch).astype(np.float32),
        "patch_embed.proj.bias": rs.randn(dim).astype(np.float32),
        "norm.weight": np.ones(dim, np.float32),
        "norm.bias": np.zeros(dim, np.float32),
    }
    for i in range(depth):
        p = f"blocks.{i}"
        sd[p + ".norm1.weight"] = np.ones(dim, np.float32)
        sd[p + ".norm1.bias"] = np.zeros(dim, np.float32)
        sd[p + ".attn.qkv.weight"] = rs.randn(3 * dim, dim).astype(np.float32)
        sd[p + ".attn.qkv.bias"] = rs.randn(3 * dim).astype(np.float32)
        sd[p + ".attn.proj.weight"] = rs.randn(dim, dim).astype(np.float32)
        sd[p + ".attn.proj.bias"] = rs.randn(dim).astype(np.float32)
        sd[p + ".norm2.weight"] = np.ones(dim, np.float32)
        sd[p + ".norm2.bias"] = np.zeros(dim, np.float32)
        sd[p + ".mlp.fc1.weight"] = rs.randn(4 * dim, dim).astype(np.float32)
        sd[p + ".mlp.fc1.bias"] = rs.randn(4 * dim).astype(np.float32)
        sd[p + ".mlp.fc2.weight"] = rs.randn(dim, 4 * dim).astype(np.float32)
        sd[p + ".mlp.fc2.bias"] = rs.randn(dim).astype(np.float32)
    return sd


def test_conversion_loads_with_exact_shapes():
    model = ViT(image_size=32, patch_size=8, dim=32, depth=2, heads=4)
    imgs = jnp.ones((1, 32, 32, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
    sd = fake_timm_sd()
    tree = load_timm_vit(params, sd, num_heads=4)
    cls, tokens = jax.jit(model.apply)(tree, imgs)
    assert cls.shape == (1, 32)
    assert np.isfinite(np.asarray(cls)).all()
    # loaded values actually took effect
    np.testing.assert_array_equal(
        np.asarray(tree["params"]["cls_token"])[0, 0], sd["cls_token"][0, 0])


def test_attention_mapping_matches_timm_math():
    """Our MHDPA with converted weights == timm's fused-qkv attention math
    (x @ qkv.T split into heads, softmax(qk/sqrt(d)) v, then proj)."""
    dim, heads, S = 32, 4, 6
    hd = dim // heads
    rs = np.random.RandomState(1)
    x = rs.randn(1, S, dim).astype(np.float32)
    sd = fake_timm_sd(depth=1, dim=dim, heads=heads)

    # manual timm attention (numpy)
    qkv_w = sd["blocks.0.attn.qkv.weight"]
    qkv_b = sd["blocks.0.attn.qkv.bias"]
    qkv = x @ qkv_w.T + qkv_b  # [1,S,3D]
    q, k, v = np.split(qkv, 3, axis=-1)

    def split_heads(t):
        return t.reshape(1, S, heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = map(split_heads, (q, k, v))
    scores = qh @ kh.transpose(0, 1, 3, 2) / np.sqrt(hd)
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    ctx = (probs @ vh).transpose(0, 2, 1, 3).reshape(1, S, dim)
    expected = ctx @ sd["blocks.0.attn.proj.weight"].T + sd["blocks.0.attn.proj.bias"]

    # ours: MHDPA with the converted weights
    from flax import linen as nn

    attn = nn.MultiHeadDotProductAttention(num_heads=heads)
    params = attn.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(x))
    conv = convert_timm_vit(sd, num_heads=heads)["block_0"]["attn"]
    tree = jax.tree_util.tree_map(np.asarray, params)
    for name in ("query", "key", "value", "out"):
        for leaf in ("kernel", "bias"):
            assert tree["params"][name][leaf].shape == conv[name][leaf].shape
            tree["params"][name][leaf] = conv[name][leaf]
    ours = np.asarray(attn.apply(tree, jnp.array(x), jnp.array(x)))
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


def test_shape_mismatch_fails_loudly():
    model = ViT(image_size=32, patch_size=8, dim=32, depth=2, heads=4)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)))
    sd = fake_timm_sd(dim=32)
    sd["patch_embed.proj.weight"] = np.zeros((32, 3, 4, 4), np.float32)
    with pytest.raises(AssertionError, match="shape mismatch"):
        load_timm_vit(params, sd, num_heads=4)
