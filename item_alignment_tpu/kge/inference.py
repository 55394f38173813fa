"""KGE inference helpers: top-k entity / relation prediction.

Equivalents of torchkge ``RelationInference`` / ``EntityInference``
(``inference.py:78-250``): given known (heads, tails) predict the missing
relation, or given (known_entities, relations) predict the missing entity,
with optional dictionary filtering of already-known facts.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from item_alignment_tpu.kge.models import KGEModel


class EntityInference:
    """Top-k missing-entity prediction for (entity, relation) queries."""

    def __init__(self, model: KGEModel, params, known_entities: np.ndarray,
                 known_relations: np.ndarray, top_k: int = 10,
                 missing: str = "tails",
                 dictionary: Optional[Dict[Tuple[int, int], set]] = None):
        assert missing in ("heads", "tails")
        self.model = model
        self.params = params
        self.known_entities = np.asarray(known_entities)
        self.known_relations = np.asarray(known_relations)
        self.top_k = top_k
        self.missing = missing
        self.dictionary = dictionary
        self.predictions: Optional[np.ndarray] = None
        self.scores: Optional[np.ndarray] = None

    def evaluate(self, b_size: int = 128) -> np.ndarray:
        preds, scores = [], []
        fn = (self.model.scores_all_tails if self.missing == "tails"
              else self.model.scores_all_heads)
        for s in range(0, len(self.known_entities), b_size):
            e = jnp.asarray(self.known_entities[s:s + b_size])
            r = jnp.asarray(self.known_relations[s:s + b_size])
            sc = np.array(fn(self.params, e, r))
            if self.dictionary is not None:
                for i in range(len(sc)):
                    key = (int(e[i]), int(r[i]))
                    for known in self.dictionary.get(key, ()):
                        sc[i, known] = -np.inf
            idx = np.argsort(-sc, axis=1)[:, : self.top_k]
            preds.append(idx)
            scores.append(np.take_along_axis(sc, idx, axis=1))
        self.predictions = np.concatenate(preds)
        self.scores = np.concatenate(scores)
        return self.predictions


class RelationInference:
    """Top-k missing-relation prediction for (head, tail) queries."""

    def __init__(self, model: KGEModel, params, heads: np.ndarray,
                 tails: np.ndarray, top_k: int = 10,
                 dictionary: Optional[Dict[Tuple[int, int], set]] = None):
        self.model = model
        self.params = params
        self.heads = np.asarray(heads)
        self.tails = np.asarray(tails)
        self.top_k = top_k
        self.dictionary = dictionary
        self.predictions: Optional[np.ndarray] = None
        self.scores: Optional[np.ndarray] = None

    def evaluate(self, b_size: int = 128) -> np.ndarray:
        n_rel = self.model.n_rel
        preds, scores = [], []
        for s in range(0, len(self.heads), b_size):
            h = self.heads[s:s + b_size]
            t = self.tails[s:s + b_size]
            B = len(h)
            hh = np.repeat(h, n_rel)
            tt = np.repeat(t, n_rel)
            rr = np.tile(np.arange(n_rel), B)
            sc = np.array(self.model.score(
                self.params, jnp.asarray(hh), jnp.asarray(rr),
                jnp.asarray(tt))).reshape(B, n_rel)
            if self.dictionary is not None:
                for i in range(B):
                    for known in self.dictionary.get((int(h[i]), int(t[i])), ()):
                        sc[i, known] = -np.inf
            idx = np.argsort(-sc, axis=1)[:, : self.top_k]
            preds.append(idx)
            scores.append(np.take_along_axis(sc, idx, axis=1))
        self.predictions = np.concatenate(preds)
        self.scores = np.concatenate(scores)
        return self.predictions
