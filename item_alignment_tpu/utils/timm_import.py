"""timm checkpoint import for the image towers.

The reference finetunes ``timm.create_model(name, pretrained=True)``
backbones (finetune_image.py:191-218) and uses a pretrained NFNet to dump
``image_embedding.json`` (data_prepare.py:275-364). These converters map
timm 0.6.5 (the reference's pinned version) state_dicts onto our Flax
param trees:

- ``convert_timm_vit``      <- ``vit_base_patch16_384``:
  patch_embed.proj [D,3,P,P] (OIHW)  -> Conv kernel [P,P,3,D] (HWIO);
  blocks.i.attn.qkv fused [3D,D]     -> MultiHeadDotProductAttention
  query/key/value kernels [D, heads, head_dim];
  blocks.i.attn.proj [D,D]           -> out kernel [heads, head_dim, D];
  mlp.fc1/fc2 transposed; LayerNorm weight/bias -> scale/bias
- ``convert_timm_nfnet``    <- ``eca_nfnet_l0``:
  ScaledStdConv weight OIHW -> HWIO, gain [O,1,1,1] -> [O];
  stages.{s}.{b}.* -> stage{s}_block{b}.*; attn_last.conv (1-d ECA conv)
  [1,1,k] -> [k,1,1]; the 1000-class head.fc is dropped (the two-tower
  head replaces it, reference image.py:214-294)
- ``convert_timm_resnetv2`` <- ``resnetv2_50`` (pre-act, BatchNormAct2d):
  conv weights OIHW -> HWIO (bias-free, timm create_conv2d default);
  each BatchNormAct2d's running stats are FOLDED into the trainable
  per-channel affine of :class:`models.image.AffineAct`:
  ``scale = w / sqrt(var + eps)``, ``bias = b - mean * scale`` — exact
  at conversion time, frozen-BN semantics afterwards.

Numerical parity with installed timm cannot be asserted in this image
(timm is absent); the mappings are validated by shape-exact loads plus
torch re-implementations of the timm 0.6.5 forward semantics in
tests/test_timm_import.py (torch-cpu is available), which the converted
Flax models must match to ~1e-4.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def convert_timm_vit(sd: Dict[str, np.ndarray], num_heads: int = None
                     ) -> Dict[str, Any]:
    sd = {k: np.asarray(v) for k, v in sd.items()}
    D = sd["cls_token"].shape[-1]
    if num_heads is None:
        # timm 0.6.5 vision_transformer.py: every vit_{base,large,huge}
        # variant uses head_dim 64 (768/12, 1024/16, 1280/16-ish), so the
        # head count is recoverable from the checkpoint's embed dim —
        # this keeps vit_large checkpoints converting correctly without
        # the caller having to thread num_heads
        num_heads = D // 64
    head_dim = D // num_heads

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    out: Dict[str, Any] = {
        "cls_token": sd["cls_token"].reshape(1, 1, D),
        "pos_embed": sd["pos_embed"],
        "patch_embed": {
            "kernel": sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0),
            "bias": sd["patch_embed.proj.bias"],
        },
        "norm": ln("norm"),
    }
    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        p = f"blocks.{i}"
        qkv_w = sd[p + ".attn.qkv.weight"]  # [3D, D] (out, in)
        qkv_b = sd[p + ".attn.qkv.bias"]
        q_w, k_w, v_w = np.split(qkv_w, 3, axis=0)
        q_b, k_b, v_b = np.split(qkv_b, 3, axis=0)

        def head_kernel(w):  # [D_out, D_in] -> [D_in, heads, head_dim]
            return w.T.reshape(D, num_heads, head_dim)

        def head_bias(b):
            return b.reshape(num_heads, head_dim)

        attn = {
            "query": {"kernel": head_kernel(q_w), "bias": head_bias(q_b)},
            "key": {"kernel": head_kernel(k_w), "bias": head_bias(k_b)},
            "value": {"kernel": head_kernel(v_w), "bias": head_bias(v_b)},
            "out": {
                # [D_out, D_in] -> [heads, head_dim, D_out]
                "kernel": sd[p + ".attn.proj.weight"].T.reshape(
                    num_heads, head_dim, D),
                "bias": sd[p + ".attn.proj.bias"],
            },
        }
        out[f"block_{i}"] = {
            "norm1": ln(p + ".norm1"),
            "attn": attn,
            "norm2": ln(p + ".norm2"),
            "mlp_fc1": {"kernel": sd[p + ".mlp.fc1.weight"].T,
                        "bias": sd[p + ".mlp.fc1.bias"]},
            "mlp_fc2": {"kernel": sd[p + ".mlp.fc2.weight"].T,
                        "bias": sd[p + ".mlp.fc2.bias"]},
        }
        i += 1
    return out


def _overlay_exact(dst, src, path=""):
    """Overwrite leaves of ``dst`` with ``src``, asserting exact shapes."""
    for k, v in src.items():
        if isinstance(v, dict):
            assert k in dst, f"unknown subtree {path}/{k}"
            _overlay_exact(dst[k], v, f"{path}/{k}")
        else:
            assert k in dst, f"unknown leaf {path}/{k}"
            assert np.shape(dst[k]) == np.shape(v), (
                f"shape mismatch at {path}/{k}: "
                f"{np.shape(dst[k])} vs {np.shape(v)}")
            dst[k] = np.asarray(v, np.float32)


def _load_converted(params: Dict[str, Any], converted: Dict[str, Any]
                    ) -> Dict[str, Any]:
    import jax

    tree = jax.tree_util.tree_map(np.asarray, params)
    _overlay_exact(tree["params"], converted)
    return tree


def load_timm_vit(params: Dict[str, Any], sd: Dict[str, np.ndarray],
                  num_heads: int = None, strict: bool = True) -> Dict[str, Any]:
    """Overlay converted timm weights onto an initialized ViT param tree
    (``{"params": ...}`` from ``ViT.init``), asserting exact shape match."""
    return _load_converted(params, convert_timm_vit(sd, num_heads))


def _conv_hwio(w: np.ndarray) -> np.ndarray:
    """torch conv weight [O, I/groups, kh, kw] -> XLA HWIO [kh, kw, I/g, O]
    (identical transpose for grouped and ungrouped convs)."""
    return np.asarray(w).transpose(2, 3, 1, 0)


def convert_timm_nfnet(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """timm 0.6.5 ``eca_nfnet_l0`` state_dict -> :class:`NFNet` param tree.

    Key layout (timm nfnet.py): ``stem.conv{1-4}``, ``stages.{s}.{b}.
    {conv1,conv2,conv2b,conv3}``, ``stages.{s}.{b}.downsample.conv``,
    ``stages.{s}.{b}.attn_last.conv`` (1-d ECA conv), ``final_conv``;
    every ScaledStdConv2d has weight/bias/gain. ``head.fc`` is dropped.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    consumed = set()

    def stdconv(prefix):
        consumed.update(f"{prefix}.{leaf}" for leaf in ("weight", "bias", "gain"))
        return {
            "kernel": _conv_hwio(sd[prefix + ".weight"]),
            "bias": sd[prefix + ".bias"],
            "gain": sd[prefix + ".gain"].reshape(-1),
        }

    out: Dict[str, Any] = {
        f"stem{i}": stdconv(f"stem.conv{i + 1}") for i in range(4)
    }
    out["final_conv"] = stdconv("final_conv")
    s = 0
    while f"stages.{s}.0.conv1.weight" in sd:
        b = 0
        while f"stages.{s}.{b}.conv1.weight" in sd:
            p = f"stages.{s}.{b}"
            block = {name: stdconv(f"{p}.{name}")
                     for name in ("conv1", "conv2", "conv2b", "conv3")}
            if f"{p}.downsample.conv.weight" in sd:
                block["downsample"] = stdconv(f"{p}.downsample.conv")
            # ECA: torch conv1d [out=1, in=1, k] -> WIO [k, 1, 1]
            eca_w = sd[f"{p}.attn_last.conv.weight"]
            consumed.add(f"{p}.attn_last.conv.weight")
            block["attn_last"] = {"conv": eca_w.transpose(2, 1, 0)}
            out[f"stage{s}_block{b}"] = block
            b += 1
        s += 1
    leftover = {k for k in sd if k not in consumed
                and not k.startswith("head.")}
    assert not leftover, f"unconsumed timm nfnet keys: {sorted(leftover)[:8]}"
    return out


def load_timm_nfnet(params: Dict[str, Any], sd: Dict[str, np.ndarray]
                    ) -> Dict[str, Any]:
    return _load_converted(params, convert_timm_nfnet(sd))


def _fold_bn(sd, prefix, eps: float = 1e-5):
    """BatchNormAct2d running stats -> AffineAct (scale, bias), exact:
    y = (x - mean)/sqrt(var+eps)*w + b = x*scale' + bias'."""
    w, b = sd[prefix + ".weight"], sd[prefix + ".bias"]
    mean = sd[prefix + ".running_mean"]
    var = sd[prefix + ".running_var"]
    scale = w / np.sqrt(var + eps)
    return {"scale": scale.astype(np.float32),
            "bias": (b - mean * scale).astype(np.float32)}


def convert_timm_resnetv2(sd: Dict[str, np.ndarray], eps: float = 1e-5
                          ) -> Dict[str, Any]:
    """timm 0.6.5 ``resnetv2_50`` state_dict -> :class:`ResNetV2` params.

    Key layout (timm resnetv2.py, preact variant): ``stem.conv``,
    ``stages.{i}.blocks.{j}.{norm1,conv1,norm2,conv2,norm3,conv3}``,
    ``stages.{i}.blocks.{j}.downsample.conv``, final ``norm``; convs are
    bias-free, norms are BatchNormAct2d (folded here). ``head.fc`` dropped.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    consumed = set()

    def conv(prefix):
        consumed.add(prefix + ".weight")
        return {"kernel": _conv_hwio(sd[prefix + ".weight"])}

    def bn(prefix):
        consumed.update(f"{prefix}.{leaf}" for leaf in (
            "weight", "bias", "running_mean", "running_var"))
        return _fold_bn(sd, prefix, eps)

    out: Dict[str, Any] = {"stem_conv": conv("stem.conv"), "norm": bn("norm")}
    i = 0
    while f"stages.{i}.blocks.0.conv1.weight" in sd:
        j = 0
        while f"stages.{i}.blocks.{j}.conv1.weight" in sd:
            p = f"stages.{i}.blocks.{j}"
            block = {}
            for n in (1, 2, 3):
                block[f"norm{n}"] = bn(f"{p}.norm{n}")
                block[f"conv{n}"] = conv(f"{p}.conv{n}")
            if f"{p}.downsample.conv.weight" in sd:
                block["downsample"] = conv(f"{p}.downsample.conv")
            out[f"stage{i}_block{j}"] = block
            j += 1
        i += 1
    leftover = {k for k in sd if k not in consumed
                and not k.startswith("head.")
                and not k.endswith("num_batches_tracked")}
    assert not leftover, f"unconsumed timm resnetv2 keys: {sorted(leftover)[:8]}"
    return out


def load_timm_resnetv2(params: Dict[str, Any], sd: Dict[str, np.ndarray]
                       ) -> Dict[str, Any]:
    return _load_converted(params, convert_timm_resnetv2(sd))


def convert_for_model_name(model_name: str, sd: Dict[str, np.ndarray],
                           num_heads: int = None) -> Dict[str, Any]:
    """Dispatch on the reference ``--model_name`` strings
    (finetune_image.py:191-218: nfnet / vit / resnet substring match)."""
    if "nfnet" in model_name:
        return convert_timm_nfnet(sd)
    if "vit" in model_name:
        return convert_timm_vit(sd, num_heads)
    if "resnet" in model_name:
        return convert_timm_resnetv2(sd)
    raise ValueError(f"no timm converter for model name: {model_name}")


def load_timm_backbone(params: Dict[str, Any], sd: Dict[str, np.ndarray],
                       model_name: str, num_heads: int = None
                       ) -> Dict[str, Any]:
    """Overlay converted timm weights into a pair-model param tree
    (e.g. ``ImageTwoTower``): locates the backbone submodule (auto-named
    ``NFNet_0`` / ``ResNetV2_0`` / ``ViT_0`` by Flax) and loads into it.
    ``params`` may be the bare param dict or wrapped in ``{"params": ...}``.
    """
    import jax

    converted = convert_for_model_name(model_name, sd, num_heads)
    wrapped = "params" in params and isinstance(params["params"], dict)
    tree = jax.tree_util.tree_map(np.asarray, params)
    inner = tree["params"] if wrapped else tree
    backbone_keys = [k for k in inner
                     if k.split("_")[0] in ("NFNet", "ResNetV2", "ViT")]
    if backbone_keys:
        assert len(backbone_keys) == 1, f"ambiguous backbones: {backbone_keys}"
        _overlay_exact(inner[backbone_keys[0]], converted)
    else:  # bare backbone tree (e.g. the embedding-dump path)
        _overlay_exact(inner, converted)
    return tree
