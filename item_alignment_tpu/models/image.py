"""Image model family (Flax Linen).

Re-designs of reference ``src/models/image.py``:

- ``ViT`` / image two-towers  <- ViT/VitTwoTower (image.py:382-499):
  patch16 pre-LN vision transformer, CLS-pooled
- ``ResNetV2``                <- ResNetTwoTower (image.py:298-378):
  pre-activation bottleneck ResNet-50 with GroupNorm + weight-standardized
  convs (timm ``resnetv2_50`` structure)
- ``NFNet``                   <- NormFreeNet/NFNetTwoTower (image.py:40-294):
  normalizer-free residual stages with ScaledStdConv, SiLU, ECA channel
  attention and expected-variance (alpha/beta) bookkeeping, eca_nfnet_l0
  shape defaults
- ``ImageTwoTower``           <- the shared pair wrapper: backbone features
  per image -> TwoTowerClassificationHead -> CE loss
  (``ClassifierHead``, image.py:16-37, is this concat head)

All towers return pooled feature vectors; pair classification follows the
same output contract as the text zoo.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from item_alignment_tpu.config import ModelConfig
from item_alignment_tpu.models.heads import TwoTowerClassificationHead
from item_alignment_tpu.models.losses import pair_loss
from item_alignment_tpu.models.outputs import PairClassifierOutput


# ------------------------------------------------------------------- ViT
class ViTBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, name="attn",
            dropout_rate=self.dropout)(h, h, deterministic=deterministic)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="mlp_fc2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h


class ViT(nn.Module):
    """vit_base_patch16_384-shaped encoder; returns (cls, tokens) like the
    reference subclass (image.py:382-460)."""

    image_size: int = 384
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    heads: int = 12
    dropout: float = 0.0

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        B = images.shape[0]
        x = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", name="patch_embed")(images)
        x = x.reshape(B, -1, self.dim)
        n_patches = x.shape[1]
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.tile(cls, (B, 1, 1)), x], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, n_patches + 1, self.dim))
        x = x + pos
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        for i in range(self.depth):
            x = ViTBlock(self.dim, self.heads, dropout=self.dropout,
                         name=f"block_{i}")(x, deterministic)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return x[:, 0], x[:, 1:]


# -------------------------------------------------------------- ResNetV2
class StdConv(nn.Module):
    """Weight-standardized conv (ResNetV2/NFNet building block)."""

    features: int
    kernel: Tuple[int, int]
    strides: int = 1
    use_bias: bool = True
    gamma: float = 1.0  # NFNet activation-gain folded into the weight scale
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.he_normal(),
                       (kh, kw, cin, self.features))
        fan_in = kh * kw * cin
        mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(w, axis=(0, 1, 2), keepdims=True)
        # scaled weight standardization (Brock et al.): gain * gamma / sqrt(N*var)
        gain = self.param("gain", nn.initializers.ones, (self.features,))
        scale = self.gamma * jax.lax.rsqrt(jnp.maximum(var * fan_in, self.eps))
        w = (w - mean) * scale * gain
        out = jax.lax.conv_general_dilated(
            x, w, (self.strides, self.strides), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.features,))
        return out



def _group_norm(name: str):
    """GroupNorm with groups adapted to the channel count (32 when it
    divides, else the largest power-of-two divisor)."""

    class _GN(nn.Module):
        @nn.compact
        def __call__(self, x):
            c = x.shape[-1]
            groups = next(g for g in (32, 16, 8, 4, 2, 1) if c % g == 0)
            return nn.GroupNorm(num_groups=groups)(x)

    return _GN(name=name)


class BottleneckV2(nn.Module):
    """Pre-activation bottleneck: GN+ReLU -> 1x1 -> 3x3 -> 1x1."""

    features: int  # bottleneck width
    out_features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        h = _group_norm("norm1")(x)
        h = jax.nn.relu(h)
        shortcut = x
        if x.shape[-1] != self.out_features or self.strides != 1:
            shortcut = StdConv(self.out_features, (1, 1), self.strides,
                               name="downsample")(h)
        h = StdConv(self.features, (1, 1), name="conv1")(h)
        h = _group_norm("norm2")(h)
        h = jax.nn.relu(h)
        h = StdConv(self.features, (3, 3), self.strides, name="conv2")(h)
        h = _group_norm("norm3")(h)
        h = jax.nn.relu(h)
        h = StdConv(self.out_features, (1, 1), name="conv3")(h)
        return shortcut + h


class ResNetV2(nn.Module):
    """resnetv2_50 structure; returns the pooled 2048-d feature."""

    depths: Sequence[int] = (3, 4, 6, 3)
    width: int = 64

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        x = StdConv(self.width, (7, 7), 2, name="stem_conv")(images)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for i, depth in enumerate(self.depths):
            features = self.width * (2 ** i)
            out_features = features * 4
            for j in range(depth):
                strides = 2 if (j == 0 and i > 0) else 1
                x = BottleneckV2(features, out_features, strides,
                                 name=f"stage{i}_block{j}")(x)
        x = _group_norm("norm")(x)
        x = jax.nn.relu(x)
        return jnp.mean(x, axis=(1, 2))  # global avg pool


# ----------------------------------------------------------------- NFNet
class ECA(nn.Module):
    """Efficient Channel Attention: 1-d conv over the channel descriptor."""

    kernel_size: int = 5

    @nn.compact
    def __call__(self, x):
        # x [B,H,W,C]
        y = jnp.mean(x, axis=(1, 2))  # [B, C]
        w = self.param("conv", nn.initializers.normal(0.02),
                       (self.kernel_size, 1, 1))
        y = jax.lax.conv_general_dilated(
            y[:, :, None], w, (1,), "SAME",
            dimension_numbers=("NWC", "WIO", "NWC"))[:, :, 0]
        return x * jax.nn.sigmoid(y)[:, None, None, :]


_SILU_GAMMA = 1.7881293296813965  # variance-preserving SiLU gain (timm)


class NFBlock(nn.Module):
    """Normalizer-free bottleneck block with variance bookkeeping:
    out = shortcut + alpha * f(beta * x); expected std grows as
    sqrt(1 + alpha^2) across blocks (image.py:40-211 semantics)."""

    out_features: int
    bottleneck_ratio: float = 0.25
    group_size: int = 64
    strides: int = 1
    alpha: float = 0.2
    beta: float = 1.0

    @nn.compact
    def __call__(self, x):
        width = int(self.out_features * self.bottleneck_ratio)
        act = lambda v: jax.nn.silu(v) * _SILU_GAMMA  # noqa: E731
        h = act(x * self.beta)
        shortcut = x
        if self.strides != 1 or x.shape[-1] != self.out_features:
            s = h
            if self.strides != 1:
                s = nn.avg_pool(s, (2, 2), strides=(2, 2))
            shortcut = StdConv(self.out_features, (1, 1), name="downsample")(s)
        h = StdConv(width, (1, 1), name="conv1", gamma=_SILU_GAMMA)(h)
        h = act(h)
        h = StdConv(width, (3, 3), self.strides, name="conv2",
                    gamma=_SILU_GAMMA)(h)
        h = act(h)
        h = StdConv(width, (3, 3), name="conv2b", gamma=_SILU_GAMMA)(h)
        h = act(h)
        h = StdConv(self.out_features, (1, 1), name="conv3")(h)
        h = ECA(name="eca")(h)
        skip_gain = self.param("skip_gain", nn.initializers.zeros, ())
        return shortcut + h * skip_gain * self.alpha


class NFNet(nn.Module):
    """eca_nfnet_l0-shaped normalizer-free net; pooled features out."""

    depths: Sequence[int] = (1, 2, 6, 3)
    channels: Sequence[int] = (256, 512, 1536, 1536)
    alpha: float = 0.2

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        act = lambda v: jax.nn.silu(v) * _SILU_GAMMA  # noqa: E731
        # 4-conv stem (16, 32, 64, 128), stride 2 at first and last
        x = StdConv(16, (3, 3), 2, name="stem0", gamma=_SILU_GAMMA)(images)
        x = act(x)
        x = StdConv(32, (3, 3), name="stem1", gamma=_SILU_GAMMA)(x)
        x = act(x)
        x = StdConv(64, (3, 3), name="stem2", gamma=_SILU_GAMMA)(x)
        x = act(x)
        x = StdConv(128, (3, 3), 2, name="stem3")(x)

        expected_std = 1.0
        for i, (depth, ch) in enumerate(zip(self.depths, self.channels)):
            for j in range(depth):
                beta = 1.0 / expected_std
                strides = 2 if (j == 0 and i > 0) else 1
                x = NFBlock(ch, strides=strides, alpha=self.alpha, beta=beta,
                            name=f"stage{i}_block{j}")(x)
                if j == 0:
                    expected_std = 1.0  # variance reset after transition
                expected_std = (expected_std ** 2 + self.alpha ** 2) ** 0.5
        x = StdConv(self.channels[-1] * 2, (1, 1), name="final_conv",
                    gamma=_SILU_GAMMA)(x)
        x = act(x)
        return jnp.mean(x, axis=(1, 2))


BACKBONES = {
    "vit": lambda cfg: ViT(image_size=cfg.image_size, patch_size=cfg.patch_size,
                           dropout=cfg.hidden_dropout_prob),
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
        f1 = tower(images_1, deterministic)
        f2 = tower(images_2, deterministic)
        if isinstance(f1, tuple):  # ViT returns (cls, tokens)
            f1, f2 = f1[0], f2[0]
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
