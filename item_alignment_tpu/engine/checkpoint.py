"""Orbax checkpointing.

Replaces the reference's per-epoch ``torch.save(state_dict)``
(``finetune_text.py:585-588``) and the full model+optimizer+step resume of
``finetune_bert.py:198-207, 396-415``.  Also provides the multi-source
restore used by PKGM finetune, which merges a text-encoder checkpoint and a
KG-embedding checkpoint into one tree (``src/models/text.py:620-651``).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import jax
from flax.core import freeze, unfreeze

from item_alignment_tpu.utils import logger


def _manager(directory: str, keep: int = 20):
    import orbax.checkpoint as ocp

    options = ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


class CheckpointManager:
    """Thin wrapper: save/restore a train-state pytree by step/epoch."""

    def __init__(self, directory: str, keep: int = 20):
        self._mgr = _manager(directory, keep)

    def save(self, step: int, tree: Any) -> None:
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(tree))
        self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None,
                like: Optional[Any] = None) -> Any:
        import orbax.checkpoint as ocp

        step = self.latest_step() if step is None else step
        if like is not None:
            target = jax.tree.map(ocp.utils.to_shape_dtype_struct, like) \
                if hasattr(ocp.utils, "to_shape_dtype_struct") else like
            return self._mgr.restore(step, args=ocp.args.StandardRestore(target))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self) -> List[int]:
        return list(self._mgr.all_steps())


def save_params(path: str, params: Any) -> None:
    """Single-file msgpack param dump (epoch-series checkpoints for soup)."""
    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, like: Any) -> Any:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(like, f.read())


def _copy_dicts(node):
    if isinstance(node, dict):
        return {k: _copy_dicts(v) for k, v in node.items()}
    return node


def merge_param_sources(base: Any, *overlays: Dict[str, Any]) -> Any:
    """Multi-source restore: start from ``base`` and overwrite subtrees.

    Mirrors the PKGM dual-checkpoint merge (text encoder weights +
    ``ent_emb``/``rel_emb``/``proj_mat`` arrays from the KGE pretrain,
    reference ``text.py:620-651``): each overlay is {path-tuple or
    dotted-string: subtree}.
    """
    import copy

    tree = unfreeze(base) if hasattr(base, "unfreeze") else base
    # deep-copy the dict structure (not the arrays) so the caller's base
    # tree is never mutated
    tree = copy.deepcopy(tree) if not isinstance(tree, dict) else \
        _copy_dicts(tree)

    def set_path(d, path, value):
        keys = path.split("/") if isinstance(path, str) else list(path)
        node = d
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value

    for overlay in overlays:
        for path, value in overlay.items():
            set_path(tree, path, value)
            logger.info(f"[merge_param_sources] injected {path}")
    return tree
