"""Image tower family: shapes, gradients, variance behavior."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from item_alignment_tpu.config import ModelConfig
from item_alignment_tpu.models.image import (
    ECA,
    ImageTwoTower,
    NFNet,
    ResNetV2,
    StdConv,
    ViT,
)

RNG = jax.random.PRNGKey(0)


def test_vit_shapes():
    m = ViT(image_size=32, patch_size=8, dim=32, depth=2, heads=4)
    imgs = jnp.ones((2, 32, 32, 3))
    params = m.init(RNG, imgs)
    cls, tokens = m.apply(params, imgs)
    assert cls.shape == (2, 32)
    assert tokens.shape == (2, 16, 32)


def test_vit_int8_mlp_tracks_fp32():
    """quant='int8' routes the ViT MLP denses through the int8 MXU path;
    the param tree must stay identical (timm converter interop) and the
    cls output must track the fp32 result."""
    import numpy as np

    fp = ViT(image_size=32, patch_size=8, dim=32, depth=2, heads=4)
    q = ViT(image_size=32, patch_size=8, dim=32, depth=2, heads=4,
            quant="int8")
    imgs = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    params = fp.init(RNG, imgs)
    qparams = q.init(RNG, imgs)
    assert (jax.tree_util.tree_structure(qparams)
            == jax.tree_util.tree_structure(params))
    cls_fp, _ = fp.apply(params, imgs)
    cls_q, _ = q.apply(params, imgs)
    err = float(jnp.max(jnp.abs(cls_q - cls_fp)))
    scale = float(jnp.max(jnp.abs(cls_fp))) + 1e-9
    assert np.isfinite(err) and err < 0.05 * scale


def test_std_conv_weight_standardization():
    m = StdConv(8, (3, 3))
    x = jnp.ones((1, 8, 8, 4))
    params = m.init(RNG, x)
    out = m.apply(params, x)
    assert out.shape == (1, 8, 8, 8)
    # standardized weights: zero mean per output channel after scaling
    w = params["params"]["kernel"]
    assert np.isfinite(np.asarray(out)).all()


def test_resnetv2_feature_dim():
    m = ResNetV2(depths=(1, 1), width=16)
    imgs = jnp.ones((1, 32, 32, 3))
    params = m.init(RNG, imgs)
    feat = m.apply(params, imgs)
    assert feat.shape == (1, 16 * 2 * 4)


def test_eca_preserves_shape_and_modulates():
    m = ECA()
    x = jnp.array(np.random.RandomState(0).randn(2, 4, 4, 8).astype(np.float32))
    params = m.init(RNG, x)
    out = m.apply(params, x)
    assert out.shape == x.shape


def test_nfnet_forward_and_grad():
    m = NFNet(depths=(1, 1), channels=(32, 64))
    imgs = jnp.array(np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32))
    params = m.init(RNG, imgs)
    feat = m.apply(params, imgs)
    # timm num_features = channels[-1] * feat_mult (1.5) = 96
    assert feat.shape == (2, 96)
    assert np.isfinite(np.asarray(feat)).all()

    def loss(p):
        return jnp.sum(m.apply(p, imgs) ** 2)

    grads = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


@pytest.mark.parametrize("backbone", ["vit_tiny", "resnet_tiny", "nfnet_tiny"])
def test_image_two_tower(backbone):
    cfg = ModelConfig(model_name=backbone, image_model_name=backbone,
                      image_size=32, patch_size=8, hidden_dropout_prob=0.0)
    # shrink towers for test speed by monkeypatching the registry
    import item_alignment_tpu.models.image as im
    orig = dict(im.BACKBONES)
    im.BACKBONES["vit"] = lambda c: ViT(image_size=32, patch_size=8, dim=32,
                                        depth=1, heads=4)
    im.BACKBONES["resnet"] = lambda c: ResNetV2(depths=(1,), width=8)
    im.BACKBONES["nfnet"] = lambda c: NFNet(depths=(1,), channels=(16,))
    try:
        model = ImageTwoTower(cfg)
        imgs = jnp.ones((2, 32, 32, 3))
        labels = jnp.array([0, 1])
        params = model.init({"params": RNG}, imgs, imgs, labels=labels)
        out = model.apply(params, imgs, imgs, labels=labels)
        assert np.isfinite(float(out.loss))
        assert out.probs.shape == (2,)
    finally:
        im.BACKBONES.update(orig)


def test_uint8_inputs_match_host_normalized():
    """uint8-shard path: the tower's on-device (x/255 - mean)/std must be
    bit-identical to feeding host-normalized fp32 (data.images.normalize),
    for every backbone entry point."""
    from item_alignment_tpu.data.images import normalize

    rs = np.random.RandomState(0)
    u8 = rs.randint(0, 256, (2, 32, 32, 3), np.uint8)
    f32 = normalize(u8)
    for make in (lambda: ViT(image_size=32, patch_size=8, dim=32,
                             depth=1, heads=4),
                 lambda: ResNetV2(depths=(1,), width=8),
                 lambda: NFNet(depths=(1,), channels=(16,))):
        model = make()
        params = jax.jit(model.init)(RNG, jnp.asarray(f32))
        out_f = model.apply(params, jnp.asarray(f32))
        out_u = model.apply(params, jnp.asarray(u8))
        for a, b in zip(jax.tree_util.tree_leaves(out_f),
                        jax.tree_util.tree_leaves(out_u)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_image_shards_store_uint8_and_train(tmp_path):
    """prepare --only_image now writes uint8 shards; an ImageTwoTower
    train step consumes them directly (normalization happens in-model)."""
    from item_alignment_tpu.data.images import (read_image_shards,
                                                train_transform,
                                                write_image_shards)

    rs = np.random.RandomState(1)
    raw = rs.randint(0, 256, (48, 48, 3), np.uint8)
    t = train_transform(raw, 32, rs, normalized=False)
    assert t.dtype == np.uint8 and t.shape == (32, 32, 3)
    paths = write_image_shards(
        [("a|b", t, t, 1), ("c|d", t, t, 0)], str(tmp_path), shard_size=8,
        transformed=True)
    batch = next(iter(read_image_shards(paths)))
    assert batch["images_1"].dtype == np.uint8
    # uint8 shards hit the compressed branch
    assert paths[0].endswith(".npz")

    import item_alignment_tpu.models.image as im
    cfg = ModelConfig(model_name="vit", image_model_name="vit",
                      image_size=32, patch_size=8, hidden_dropout_prob=0.0)
    orig = dict(im.BACKBONES)
    im.BACKBONES["vit"] = lambda c: ViT(image_size=32, patch_size=8, dim=32,
                                        depth=1, heads=4)
    try:
        model = ImageTwoTower(cfg)
        imgs = jnp.asarray(batch["images_1"])
        labels = jnp.asarray(batch["labels"])
        params = jax.jit(model.init)({"params": RNG}, imgs, imgs,
                                     labels=labels)
        loss = model.apply(params, imgs, imgs, labels=labels).loss
        assert np.isfinite(float(loss))
    finally:
        im.BACKBONES.update(orig)
