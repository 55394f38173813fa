"""HuggingFace/torch checkpoint import.

Converts a torch ``state_dict`` (HF BERT/Chinese-RoBERTa naming, the
``pytorch_model.bin`` the reference finetunes from) into this framework's
Flax param tree, including the reference's loading quirks:

- ``type_vocab_size > 2``: copy the pretrained 2 token-type rows into the
  first rows of the larger table (finetune_text.py:243-248)
- ``max_position_embeddings > 512``: copy the pretrained 512 position rows
  (finetune_text.py:250-255)
- PKGM dual-checkpoint merge: text encoder ``pytorch_model.bin`` +
  ``pkgm_model.bin`` KG arrays (ent_emb/rel_emb/proj_mat) into one tree
  (src/models/text.py:615-651)

Works on plain numpy arrays — torch is only needed to unpickle ``.bin``
files (``load_torch_state_dict``).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def _strip_prefix(name: str) -> str:
    for p in ("bert.", "roberta."):
        if name.startswith(p):
            return name[len(p):]
    return name


def convert_encoder_state_dict(
    sd: Dict[str, np.ndarray],
    type_vocab_size: Optional[int] = None,
    max_position_embeddings: Optional[int] = None,
    rng: Optional[np.random.RandomState] = None,
    initializer_range: float = 0.02,
) -> Dict[str, Any]:
    """HF encoder weights -> {"embeddings": ..., "encoder": ...} matching
    ``RobertaBackbone``'s param tree.  Dense kernels are transposed
    (torch stores [out, in]); embedding row-copy quirks applied when the
    target sizes exceed the checkpoint's."""
    rng = rng or np.random.RandomState(0)
    sd = {_strip_prefix(k): np.asarray(v) for k, v in sd.items()}

    def grow(table: np.ndarray, target_rows: Optional[int]) -> np.ndarray:
        if target_rows is None or target_rows <= table.shape[0]:
            return table
        out = rng.normal(0.0, initializer_range,
                         (target_rows, table.shape[1])).astype(table.dtype)
        out[: table.shape[0]] = table
        return out

    emb = {
        "word_embeddings": {
            "embedding": sd["embeddings.word_embeddings.weight"]},
        "post": {
            "token_type_embeddings": {
                "embedding": grow(sd["embeddings.token_type_embeddings.weight"],
                                  type_vocab_size)},
            "position_embeddings": {
                "embedding": grow(sd["embeddings.position_embeddings.weight"],
                                  max_position_embeddings)},
            "layer_norm": {
                "scale": sd["embeddings.LayerNorm.weight"],
                "bias": sd["embeddings.LayerNorm.bias"]},
        },
    }

    encoder: Dict[str, Any] = {}
    layer_ids = sorted({int(m.group(1)) for k in sd
                        if (m := re.match(r"encoder\.layer\.(\d+)\.", k))})
    for i in layer_ids:
        p = f"encoder.layer.{i}."

        def dense(name):
            return {"kernel": sd[p + name + ".weight"].T,
                    "bias": sd[p + name + ".bias"]}

        def ln(name):
            return {"scale": sd[p + name + ".weight"],
                    "bias": sd[p + name + ".bias"]}

        encoder[f"layer_{i}"] = {
            "attention": {
                "query": dense("attention.self.query"),
                "key": dense("attention.self.key"),
                "value": dense("attention.self.value"),
                "output": dense("attention.output.dense"),
            },
            "attention_layer_norm": ln("attention.output.LayerNorm"),
            "intermediate": dense("intermediate.dense"),
            "mlp_output": dense("output.dense"),
            "output_layer_norm": ln("output.LayerNorm"),
        }
    return {"embeddings": emb, "encoder": encoder}


def convert_pkgm_state_dicts(
    roberta_sd: Dict[str, np.ndarray],
    kg_sd: Dict[str, np.ndarray],
    type_vocab_size: Optional[int] = None,
    max_position_embeddings: Optional[int] = None,
) -> Dict[str, Any]:
    """Merge the text-encoder checkpoint with the PKGM pretrain arrays
    (``ent_emb.weight`` / ``rel_emb.weight`` / ``proj_mat.weight``) into a
    ``PKGMBackbone`` param tree (text.py:615-651 merge semantics)."""
    tree = convert_encoder_state_dict(
        roberta_sd, type_vocab_size, max_position_embeddings)
    kg = {_strip_prefix(k): np.asarray(v) for k, v in kg_sd.items()}

    def find(*names):
        for n in names:
            if n in kg:
                return kg[n]
        raise KeyError(f"none of {names} in kg checkpoint: {list(kg)[:8]}")

    tree["embeddings"]["ent_emb"] = {
        "embedding": find("ent_emb.weight", "ent_emb")}
    tree["embeddings"]["rel_emb"] = {
        "embedding": find("rel_emb.weight", "rel_emb")}
    proj = find("proj_mat.weight", "proj_mat")
    tree["embeddings"]["proj_mat"] = {"kernel": proj.T}
    if "proj_mat.bias" in kg:
        tree["embeddings"]["proj_mat"]["bias"] = kg["proj_mat.bias"]
    return tree


def import_hf_roberta(params: Dict[str, Any], sd: Dict[str, np.ndarray],
                      config) -> Dict[str, Any]:
    """Overlay HF encoder weights onto an initialized model param tree
    (``{"params": {"roberta": ...}}`` from RobertaOneTower/TwoTower init)."""
    import jax

    converted = convert_encoder_state_dict(
        sd, config.type_vocab_size, config.max_position_embeddings)
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    target = params["params"]["roberta"]
    for k in ("embeddings", "encoder"):
        _overlay(target[k], converted[k])
    return params


def _overlay(dst, src):
    for k, v in src.items():
        if isinstance(v, dict):
            _overlay(dst[k], v)
        else:
            assert np.shape(dst[k]) == np.shape(v), \
                f"shape mismatch for {k}: {np.shape(dst[k])} vs {np.shape(v)}"
            dst[k] = np.asarray(v, dtype=np.float32)


def _overlay_rows(dst, src):
    """Like ``_overlay`` but tolerates embedding tables whose ROW count
    differs: the overlapping leading rows are copied and the rest of the
    destination rows are kept (the reference's token_type>2 /
    position>512 row-copy quirk, finetune_text.py:243-255, applied in
    both directions, e.g. a 5-type pretrain table into a 4-type model)."""
    for k, v in src.items():
        if isinstance(v, dict):
            _overlay_rows(dst[k], v)
            continue
        if np.shape(dst[k]) == np.shape(v):
            dst[k] = np.asarray(v, dtype=np.float32)
            continue
        d = np.asarray(dst[k])
        assert (d.ndim == 2 and np.ndim(v) == 2
                and d.shape[1] == np.shape(v)[1]), \
            f"incompatible shapes for {k}: {d.shape} vs {np.shape(v)}"
        rows = min(d.shape[0], np.shape(v)[0])
        out = np.array(d, dtype=np.float32)
        out[:rows] = np.asarray(v, dtype=np.float32)[:rows]
        dst[k] = out
