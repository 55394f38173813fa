"""High-throughput two-tower inference: the embedding-cache path.

The reference's two-tower models re-encode both items for every pair.  The
TPU-native serving design encodes each unique item ONCE into an embedding
cache, then scores arbitrary pair lists with just the classification head —
a gather + one small matmul per pair (SURVEY.md §6 north-star:
>=10k pairs/sec/chip).

Works with any model exposing a per-item tower + TwoTowerClassificationHead
(RobertaTwoTower, PKGMTwoTower, TextCNNTwoTower, ImageTwoTower) and with
vec_sim heads (pure similarity, no extra params beyond the shared dense).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class TwoTowerInference:
    """encode-once / score-many serving wrapper.

    - ``encode_fn(params, batch_dict) -> [B, F]`` item embeddings
    - ``head_fn(params, src_emb, tgt_emb) -> probs [B]``
    """

    def __init__(self, params, encode_fn: Callable, head_fn: Callable,
                 batch_size: int = 256, cache_quant: Optional[str] = None):
        """``cache_quant="int8"`` stores the embedding cache as int8 rows
        with per-row absmax scales (ops/quant.py): half the cache HBM and
        half the gather bandwidth on the scoring hot loop, at a <1e-2
        probability perturbation (per-row symmetric quantization of
        already-normalized tower outputs)."""
        self.params = params
        self._encode = jax.jit(encode_fn)
        self.batch_size = batch_size
        self.cache: Optional[jax.Array] = None
        self.cache_scale: Optional[jax.Array] = None
        self.cache_quant = cache_quant
        self.id_to_row: Dict[str, int] = {}

        # gather + (dequant +) head in ONE jitted program: the eager
        # per-batch jnp.take dispatches used to cost more than the score
        # matmul itself through a remote device
        def gather_score(params, cache, scale, src, tgt):
            se = jnp.take(cache, src, axis=0)
            te = jnp.take(cache, tgt, axis=0)
            if scale is not None:
                se = se.astype(jnp.float32) * jnp.take(scale, src, axis=0)
                te = te.astype(jnp.float32) * jnp.take(scale, tgt, axis=0)
            return head_fn(params, se, te)

        self._score = jax.jit(head_fn)  # kept for direct-embedding callers
        self._gather_score = jax.jit(gather_score)
        self._gather_score_plain = jax.jit(
            lambda params, cache, src, tgt:
            gather_score(params, cache, None, src, tgt))

    def build_cache(self, item_ids, batches: Iterable[Dict[str, np.ndarray]]
                    ) -> jax.Array:
        """Encode all items once; ``batches`` yields fixed-shape feature
        dicts aligned with ``item_ids`` order."""
        embs = []
        for batch in batches:
            embs.append(np.asarray(self._encode(self.params, batch)))
        cache = np.concatenate(embs)[: len(item_ids)]
        self.id_to_row = {iid: i for i, iid in enumerate(item_ids)}
        if self.cache_quant == "int8":
            from item_alignment_tpu.ops.quant import quantize_rowwise

            self.cache, self.cache_scale = jax.jit(quantize_rowwise)(
                jnp.asarray(cache))
        else:
            self.cache = jnp.asarray(cache)
        return self.cache

    def score_pairs(self, src_idx: np.ndarray, tgt_idx: np.ndarray
                    ) -> np.ndarray:
        """Probabilities for (src, tgt) row-index pairs against the cache."""
        assert self.cache is not None, "call build_cache first"
        n = len(src_idx)
        if n == 0:
            return np.zeros(0, np.float32)
        bs = self.batch_size
        out = []
        pad = (-n) % bs
        src = np.concatenate([src_idx, np.zeros(pad, src_idx.dtype)])
        tgt = np.concatenate([tgt_idx, np.zeros(pad, tgt_idx.dtype)])
        for s in range(0, n + pad, bs):
            si = jnp.asarray(src[s:s + bs])
            ti = jnp.asarray(tgt[s:s + bs])
            if self.cache_scale is not None:
                probs = self._gather_score(self.params, self.cache,
                                           self.cache_scale, si, ti)
            else:
                probs = self._gather_score_plain(self.params, self.cache,
                                                 si, ti)
            out.append(np.asarray(probs))
        return np.concatenate(out)[:n]

    def score_pairs_by_id(self, pairs) -> np.ndarray:
        src = np.array([self.id_to_row[a] for a, _ in pairs], np.int32)
        tgt = np.array([self.id_to_row[b] for _, b in pairs], np.int32)
        return self.score_pairs(src, tgt)


def two_tower_head_fn(model, config):
    """Build (encode_fn, head_fn) for a TwoTower model whose tower is the
    ``__call__`` path and whose head is ``classifier`` (concat + out_proj).

    The head re-uses the trained params: probs = softmax([src;tgt] W + b)[:,1].
    """

    def head_fn(params, src_emb, tgt_emb):
        head = params["params"]["classifier"]["out_proj"]
        logits = jnp.concatenate((src_emb, tgt_emb), -1) @ head["kernel"] \
            + head["bias"]
        return jax.nn.softmax(logits, axis=-1)[:, 1]

    return head_fn
