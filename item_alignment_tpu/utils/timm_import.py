"""timm checkpoint import for the image towers.

``convert_timm_vit`` maps a timm ``VisionTransformer`` state_dict (the
``vit_base_patch16_384`` weights the reference finetunes from,
finetune_image.py:191-218) onto :class:`models.image.ViT`'s param tree:

- patch_embed.proj [D,3,P,P] (OIHW)  -> Conv kernel [P,P,3,D] (HWIO)
- blocks.i.attn.qkv  fused [3D,D]    -> MultiHeadDotProductAttention
  query/key/value kernels [D, heads, head_dim]
- blocks.i.attn.proj [D,D]           -> out kernel [heads, head_dim, D]
- mlp.fc1/fc2 transposed; LayerNorm weight/bias -> scale/bias

Numerical parity with timm cannot be asserted in this image (timm is not
installed); the mapping is validated structurally (exact shape match for
every leaf) and by tests that a converted tree loads and runs.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def convert_timm_vit(sd: Dict[str, np.ndarray], num_heads: int = 12
                     ) -> Dict[str, Any]:
    sd = {k: np.asarray(v) for k, v in sd.items()}
    D = sd["cls_token"].shape[-1]
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


def load_timm_vit(params: Dict[str, Any], sd: Dict[str, np.ndarray],
                  num_heads: int = 12, strict: bool = True) -> Dict[str, Any]:
    """Overlay converted timm weights onto an initialized ViT param tree
    (``{"params": ...}`` from ``ViT.init``), asserting exact shape match."""
    import jax

    converted = convert_timm_vit(sd, num_heads)
    tree = jax.tree_util.tree_map(np.asarray, params)

    def overlay(dst, src, path=""):
        for k, v in src.items():
            if isinstance(v, dict):
                assert k in dst, f"unknown subtree {path}/{k}"
                overlay(dst[k], v, f"{path}/{k}")
            else:
                assert np.shape(dst[k]) == np.shape(v), (
                    f"shape mismatch at {path}/{k}: "
                    f"{np.shape(dst[k])} vs {np.shape(v)}")
                dst[k] = np.asarray(v, np.float32)

    overlay(tree["params"], converted)
    return tree
