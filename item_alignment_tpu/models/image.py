"""Image model family (Flax Linen).

Re-designs of reference ``src/models/image.py``:

- ``ViT`` / image two-towers  <- ViT/VitTwoTower (image.py:382-499):
  patch16 pre-LN vision transformer, CLS-pooled
- ``ResNetV2``                <- ResNetTwoTower (image.py:298-378):
  timm 0.6.5 ``resnetv2_50``: pre-activation bottleneck ResNet-50.
  timm's BatchNormAct2d running stats are FOLDED into a trainable
  per-channel affine (:class:`AffineAct`) at conversion time — frozen-BN
  finetuning, the standard TPU/JAX practice (keeps the train step free of
  cross-replica batch-stat sync collectives and mutable state).
- ``NFNet``                   <- NormFreeNet/NFNetTwoTower (image.py:40-294):
  timm 0.6.5 ``eca_nfnet_l0``: normalizer-free residual stages with
  ScaledStdConv (gamma folded into the weight scale, ``gamma_in_act=False``),
  grouped 3x3 convs (group_size 64), ECA applied after conv3 with
  ``attn_gain`` 2.0, zero-init conv3 gain, deep_quad stem, and
  expected-variance (alpha/beta) bookkeeping.
- ``ImageTwoTower``           <- the shared pair wrapper: backbone features
  per image -> TwoTowerClassificationHead -> CE loss
  (``ClassifierHead``, image.py:16-37, is this concat head)

Convolution padding follows torch's symmetric static padding
``((s-1)+d*(k-1))//2`` (timm ``get_padding``) rather than XLA ``SAME`` so
converted timm weights (``utils/timm_import.py``) are numerically exact —
the two differ by a one-pixel window shift for stride-2 convs.

All towers return pooled feature vectors; pair classification follows the
same output contract as the text zoo.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from item_alignment_tpu.config import ModelConfig
from item_alignment_tpu.models.heads import TwoTowerClassificationHead
from item_alignment_tpu.models.losses import pair_loss
from item_alignment_tpu.models.outputs import PairClassifierOutput


def maybe_normalize_uint8(images: jax.Array) -> jax.Array:
    """uint8 [B, H, W, 3] -> ImageNet-normalized fp32, on device.

    Image shards store post-transform uint8 (4x smaller on disk and over
    the host->device transfer than normalized fp32); (x/255 - mean)/std
    here is bit-identical to the host ``data.images.normalize`` and XLA
    fuses it into the first conv.  Float inputs (legacy fp32 shards,
    host-normalized paths) pass through unchanged."""
    if images.dtype != jnp.uint8:
        return images
    from item_alignment_tpu.data.images import IMAGENET_MEAN, IMAGENET_STD

    x = images.astype(jnp.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def _torch_pad(k: int, s: int = 1, d: int = 1) -> Tuple[int, int]:
    """timm/torch symmetric static padding (timm layers/padding.py)."""
    p = ((s - 1) + d * (k - 1)) // 2
    return (p, p)


# ------------------------------------------------------------------- ViT
class ViTBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    dtype: Optional[Any] = None
    quant: Optional[str] = None  # "int8": MLP denses on the int8 MXU
    #                              (2/3 of the block's dense FLOPs; the
    #                              MHDPA projections keep their DenseGeneral
    #                              param layout for timm interop)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from item_alignment_tpu.models.encoder import QuantDense

        dense = QuantDense if self.quant == "int8" else nn.Dense
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, name="attn", dtype=self.dtype,
            dropout_rate=self.dropout)(h, h, deterministic=deterministic)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                  name="mlp_fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h


class ViT(nn.Module):
    """Config-shaped ViT encoder; returns (cls, tokens) like the reference
    subclass (image.py:382-412: embed_dim=hidden_size,
    depth=num_hidden_layers, num_heads=num_attention_heads, mlp_ratio=4)."""

    image_size: int = 384
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    dtype: Optional[Any] = None
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        images = maybe_normalize_uint8(images)
        B = images.shape[0]
        x = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", dtype=self.dtype,
                    name="patch_embed")(images)
        x = x.reshape(B, -1, self.dim)
        n_patches = x.shape[1]
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate(
            [jnp.tile(cls.astype(x.dtype), (B, 1, 1)), x], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, n_patches + 1, self.dim))
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        for i in range(self.depth):
            x = ViTBlock(self.dim, self.heads, mlp_ratio=self.mlp_ratio,
                         dropout=self.dropout,
                         dtype=self.dtype, quant=self.quant,
                         name=f"block_{i}")(x, deterministic)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return x[:, 0], x[:, 1:]


# ---------------------------------------------------------------- shared
class StdConv(nn.Module):
    """ScaledStdConv2d parity (timm 0.6.5 layers/std_conv.py):

    ``w_hat = (w - mean) / sqrt(var + eps) * gain * gamma / sqrt(fan_in)``

    where mean/var are per-output-channel over the (kh, kw, cin/groups)
    fan-in (biased variance — torch ``F.batch_norm(training=True)``) and
    ``gamma`` is the activation's variance-preserving gain, folded into
    the conv like timm's ``gamma_in_act=False`` default.
    """

    features: int
    kernel: Tuple[int, int]
    strides: int = 1
    groups: int = 1
    use_bias: bool = True
    gamma: float = 1.0
    eps: float = 1e-5  # NfCfg.std_conv_eps
    gain_init: float = 1.0

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        cin = x.shape[-1] // self.groups
        w = self.param("kernel", nn.initializers.he_normal(),
                       (kh, kw, cin, self.features))
        fan_in = kh * kw * cin
        mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(w, axis=(0, 1, 2), keepdims=True)
        gain = self.param(
            "gain", nn.initializers.constant(self.gain_init), (self.features,))
        scale = gain * (self.gamma * fan_in ** -0.5) * jax.lax.rsqrt(
            var + self.eps)
        # standardization in fp32 (params are fp32); compute dtype
        # follows the input (bf16 on the TPU fast path)
        w = ((w - mean) * scale).astype(x.dtype)
        out = jax.lax.conv_general_dilated(
            x, w, (self.strides, self.strides),
            [_torch_pad(kh, self.strides), _torch_pad(kw, self.strides)],
            feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.features,)).astype(out.dtype)
        return out


class PlainConv(nn.Module):
    """timm ``create_conv2d`` equivalent: plain conv, bias=False default
    (conv2d_same.py ``kwargs.setdefault('bias', False)``), torch padding."""

    features: int
    kernel: Tuple[int, int]
    strides: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        cin = x.shape[-1] // self.groups
        w = self.param("kernel", nn.initializers.he_normal(),
                       (kh, kw, cin, self.features)).astype(x.dtype)
        return jax.lax.conv_general_dilated(
            x, w, (self.strides, self.strides),
            [_torch_pad(kh, self.strides), _torch_pad(kw, self.strides)],
            feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


# -------------------------------------------------------------- ResNetV2
class AffineAct(nn.Module):
    """Folded frozen BatchNormAct2d: per-channel affine + ReLU.

    timm's running mean/var are folded into (scale, bias) at conversion
    (``convert_timm_resnetv2``); both stay trainable, matching frozen-BN
    finetuning. Init (1, 0) is identity-affine for from-scratch runs.
    """

    apply_act: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        x = x * scale.astype(x.dtype) + bias.astype(x.dtype)
        return jax.nn.relu(x) if self.apply_act else x


class PreActBottleneck(nn.Module):
    """timm 0.6.5 resnetv2.py PreActBottleneck: norm1 -> (downsample on the
    pre-activated input) / conv1 -> norm2 -> conv2 -> norm3 -> conv3."""

    features: int  # bottleneck width (out_features * 0.25)
    out_features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        x_preact = AffineAct(name="norm1")(x)
        shortcut = x
        if x.shape[-1] != self.out_features or self.strides != 1:
            shortcut = PlainConv(self.out_features, (1, 1), self.strides,
                                 name="downsample")(x_preact)
        h = PlainConv(self.features, (1, 1), name="conv1")(x_preact)
        h = AffineAct(name="norm2")(h)
        h = PlainConv(self.features, (3, 3), self.strides, name="conv2")(h)
        h = AffineAct(name="norm3")(h)
        h = PlainConv(self.out_features, (1, 1), name="conv3")(h)
        return h + shortcut


class ResNetV2(nn.Module):
    """timm ``resnetv2_50`` structure; returns the pooled 2048-d feature."""

    depths: Sequence[int] = (3, 4, 6, 3)
    width: int = 64

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        images = maybe_normalize_uint8(images)
        x = PlainConv(self.width, (7, 7), 2, name="stem_conv")(images)
        # torch MaxPool2d(3, 2, padding=1): -inf padding, floor division
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, depth in enumerate(self.depths):
            features = self.width * (2 ** i)
            out_features = features * 4
            for j in range(depth):
                strides = 2 if (j == 0 and i > 0) else 1
                x = PreActBottleneck(features, out_features, strides,
                                     name=f"stage{i}_block{j}")(x)
        x = AffineAct(name="norm")(x)
        return jnp.mean(x, axis=(1, 2))  # global avg pool


# ----------------------------------------------------------------- NFNet
class ECA(nn.Module):
    """Efficient Channel Attention (timm EcaModule): 1-d conv (bias-free)
    over the per-channel average descriptor, sigmoid gate."""

    kernel_size: int = 5

    @nn.compact
    def __call__(self, x):
        # x [B,H,W,C]
        y = jnp.mean(x, axis=(1, 2))  # [B, C]
        w = self.param("conv", nn.initializers.normal(0.02),
                       (self.kernel_size, 1, 1)).astype(y.dtype)
        y = jax.lax.conv_general_dilated(
            y[:, :, None], w, (1,), [_torch_pad(self.kernel_size)],
            dimension_numbers=("NWC", "WIO", "NWC"))[:, :, 0]
        return x * jax.nn.sigmoid(y)[:, None, None, :]


def eca_kernel_size(channels: int, gamma: int = 2, beta: int = 1) -> int:
    """timm EcaModule adaptive kernel: odd(|log2(C)+beta|/gamma), min 3."""
    import math

    t = int(abs(math.log(channels, 2) + beta) / gamma)
    return max(t if t % 2 else t + 1, 3)


_SILU_GAMMA = 1.7881293296813965  # timm _nonlin_gamma['silu']


def make_divisible(v, divisor: int = 8, min_value=None,
                   round_limit: float = 0.9) -> int:
    """timm layers/helpers.py make_divisible — exact."""
    min_value = min_value or divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < round_limit * v:
        new_v += divisor
    return new_v


class NFBlock(nn.Module):
    """timm 0.6.5 NormFreeBlock (reg=False, extra_conv=True, skipinit=False):

    ``out = act1(x) * beta``; shortcut = downsample(out) (avg-pool + 1x1)
    or x; residual = conv3(act3(conv2b(act2b(conv2(act2(conv1(out)))))))
    with grouped 3x3 convs; ``out = attn_gain * eca(residual) * alpha +
    shortcut``. conv3's gain is zero-init (the NFNet residual zero-init).
    """

    out_features: int
    bottleneck_ratio: float = 0.25
    group_size: int = 64
    strides: int = 1
    alpha: float = 0.2
    beta: float = 1.0
    attn_gain: float = 2.0

    @nn.compact
    def __call__(self, x):
        # timm: mid_chs = make_divisible(out_chs * bottle_ratio); groups =
        # mid_chs // group_size; mid_chs re-snapped to group_size * groups
        width = make_divisible(self.out_features * self.bottleneck_ratio)
        groups = max(width // self.group_size, 1)
        width = groups * self.group_size if width >= self.group_size else width
        conv = lambda f, k, s=1, g=1, **kw: StdConv(  # noqa: E731
            f, (k, k), s, groups=g, gamma=_SILU_GAMMA, **kw)
        h = jax.nn.silu(x) * self.beta
        shortcut = x
        if self.strides != 1 or x.shape[-1] != self.out_features:
            s = h
            if self.strides != 1:
                s = nn.avg_pool(s, (2, 2), strides=(2, 2))
            shortcut = conv(self.out_features, 1, name="downsample")(s)
        h = conv(width, 1, name="conv1")(h)
        h = conv(width, 3, self.strides, groups, name="conv2")(jax.nn.silu(h))
        h = conv(width, 3, 1, groups, name="conv2b")(jax.nn.silu(h))
        h = conv(self.out_features, 1, gain_init=0.0,
                 name="conv3")(jax.nn.silu(h))
        h = self.attn_gain * ECA(eca_kernel_size(self.out_features),
                                 name="attn_last")(h)
        return shortcut + h * self.alpha


class NFNet(nn.Module):
    """timm ``eca_nfnet_l0``-shaped normalizer-free net; pooled 2304-d
    features out (num_features = channels[-1] * feat_mult 1.5)."""

    depths: Sequence[int] = (1, 2, 6, 3)
    channels: Sequence[int] = (256, 512, 1536, 1536)
    group_size: int = 64
    alpha: float = 0.2
    stem_chs: int = 128
    feat_mult: float = 1.5

    @property
    def num_features(self) -> int:
        return int(self.channels[-1] * self.feat_mult)

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        conv = lambda f, k, s=1, **kw: StdConv(  # noqa: E731
            f, (k, k), s, gamma=_SILU_GAMMA, **kw)
        # deep_quad stem (timm create_stem): 3x3 convs at strides 2,1,1,2
        # with out//8, out//4, out//2, out channels; silu between (not after)
        c = self.stem_chs
        images = maybe_normalize_uint8(images)
        x = conv(c // 8, 3, 2, name="stem0")(images)
        x = conv(c // 4, 3, name="stem1")(jax.nn.silu(x))
        x = conv(c // 2, 3, name="stem2")(jax.nn.silu(x))
        x = conv(c, 3, 2, name="stem3")(jax.nn.silu(x))

        # timm variance bookkeeping: beta from the running expected_var,
        # reset to 1 after each stage's first block, += alpha^2 per block
        expected_var = 1.0
        for i, (depth, ch) in enumerate(zip(self.depths, self.channels)):
            for j in range(depth):
                beta = 1.0 / expected_var ** 0.5
                # stem_stride is 4, so stage 0 keeps stride 1
                strides = 2 if (j == 0 and i > 0) else 1
                x = NFBlock(ch, group_size=self.group_size,
                            strides=strides, alpha=self.alpha, beta=beta,
                            name=f"stage{i}_block{j}")(x)
                if j == 0:
                    expected_var = 1.0
                expected_var += self.alpha ** 2
        x = conv(self.num_features, 1, name="final_conv")(x)
        x = jax.nn.silu(x)
        return jnp.mean(x, axis=(1, 2))


BACKBONES = {
    # config-faithful shapes (reference image.py:382-396 builds
    # VisionTransformer(embed_dim=hidden_size, depth=num_hidden_layers,
    # num_heads=num_attention_heads, mlp_ratio=4) straight from the JSON
    # config, so vit_large_patch16_384.json must yield a 24L/1024/16h tower)
    "vit": lambda cfg: ViT(image_size=cfg.image_size, patch_size=cfg.patch_size,
                           dim=cfg.hidden_size, depth=cfg.num_hidden_layers,
                           heads=cfg.num_attention_heads,
                           mlp_ratio=cfg.intermediate_size / cfg.hidden_size,
                           dropout=cfg.hidden_dropout_prob,
                           dtype=jnp.bfloat16 if cfg.dtype == "bfloat16"
                           else None, quant=cfg.quant),
    "resnet": lambda cfg: ResNetV2(),
    "nfnet": lambda cfg: NFNet(),
}


def backbone_for(name: str, cfg: ModelConfig) -> nn.Module:
    for key, fn in BACKBONES.items():
        if key in name:
            return fn(cfg)
    raise ValueError(f"unknown image backbone: {name} (want vit/resnet/nfnet)")


class ImageTwoTower(nn.Module):
    """Shared-weight image towers + concat head (NFNetTwoTower /
    ResNetTwoTower / VitTwoTower, image.py:214-499)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, images_1, images_2, labels=None,
                 deterministic: bool = True):
        cfg = self.config
        tower = backbone_for(cfg.image_model_name, cfg)
        if cfg.dtype == "bfloat16":
            images_1 = images_1.astype(jnp.bfloat16)
            images_2 = images_2.astype(jnp.bfloat16)
        f1 = tower(images_1, deterministic)
        f2 = tower(images_2, deterministic)
        if isinstance(f1, tuple):  # ViT returns (cls, tokens)
            f1, f2 = f1[0], f2[0]
        f1 = f1.astype(jnp.float32)
        f2 = f2.astype(jnp.float32)
        src_embeds, tgt_embeds, logits, probs = TwoTowerClassificationHead(
            dropout_rate=cfg.hidden_dropout_prob, num_labels=cfg.num_labels,
            name="classifier")(f1, f2, deterministic)
        probs_pos = probs[:, 1]
        loss = None
        if labels is not None:
            loss = pair_loss(cfg.loss_type, logits, probs_pos, labels,
                             src_embeds, tgt_embeds, cfg.loss_margin,
                             cfg.num_labels)
        return PairClassifierOutput(loss=loss, logits=logits, probs=probs_pos,
                                    src_embeds=src_embeds, tgt_embeds=tgt_embeds)
