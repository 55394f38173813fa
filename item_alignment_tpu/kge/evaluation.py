"""Link-prediction / relation-prediction / triplet-classification evaluation.

Equivalents of torchkge ``evaluation.py:16-530``:

- LinkPredictionEvaluator: raw + filtered mean rank / MRR / hit@k by scoring
  ALL entity candidates per test triple.  On TPU this is a batched matmul
  over the entity table (``KGEModel.scores_all_*``) instead of the
  reference's per-batch expand loop (evaluation.py:286-300).
- RelationPredictionEvaluator: ranks all relations per triple.
- TripletClassificationEvaluator: per-relation score thresholds chosen on a
  validation set, accuracy on test (evaluation.py:428-530).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from item_alignment_tpu.kge.graph import KnowledgeGraph
from item_alignment_tpu.kge.models import KGEModel


def _ranks_from_scores(scores: np.ndarray, true_idx: np.ndarray) -> np.ndarray:
    """rank = 1 + #candidates with strictly higher score."""
    true_scores = scores[np.arange(len(true_idx)), true_idx]
    return 1 + (scores > true_scores[:, None]).sum(axis=1)


class LinkPredictionEvaluator:
    """Raw + filtered ranks computed ON DEVICE: per batch only two [bs]
    rank vectors come back to the host.  (Transferring the [bs, n_ent]
    score matrices — 258k fp32 columns per triple at reference scale — is
    what melts a naive port of torchkge's evaluation.py:286-300; the
    filtered rank is instead ``raw − #(known-true candidates scoring above
    the target)`` with the per-triple known sets padded to a fixed width.)
    """

    def __init__(self, model: KGEModel, params, kg_test: KnowledgeGraph,
                 kg_filter: Optional[Tuple[KnowledgeGraph, ...]] = None,
                 batch_size: int = 128):
        self.model = model
        self.params = params
        self.kg = kg_test
        self.batch_size = batch_size
        filters = kg_filter if kg_filter is not None else (kg_test,)
        self.true_tails = kg_test.dict_of_tails(*[k for k in filters if k is not kg_test])
        self.true_heads = kg_test.dict_of_heads(*[k for k in filters if k is not kg_test])
        self.ranks_t = self.ranks_h = None
        self.filt_ranks_t = self.filt_ranks_h = None

        scores_all = {"tails": model.scores_all_tails,
                      "heads": model.scores_all_heads}

        def ranks_fn(side):
            def fn(params, anchor, rel, true_idx, known_idx):
                scores = scores_all[side](params, anchor, rel)  # [bs, n_ent]
                bs = scores.shape[0]
                true_s = scores[jnp.arange(bs), true_idx]
                raw = 1 + jnp.sum(scores > true_s[:, None], axis=1,
                                  dtype=jnp.int32)
                # filtered = raw minus known-true others scoring higher
                # (equivalent to the -inf masking, without materializing
                # the masked matrix on host)
                valid = known_idx >= 0
                ks = jnp.take_along_axis(scores, jnp.maximum(known_idx, 0),
                                         axis=1)
                higher = jnp.sum(valid & (ks > true_s[:, None]), axis=1,
                                 dtype=jnp.int32)
                return raw, raw - higher
            return jax.jit(fn)

        self._ranks_t_fn = ranks_fn("tails")
        self._ranks_h_fn = ranks_fn("heads")

    @staticmethod
    def _pad_known(dct, keys_a, rels, targets, width) -> np.ndarray:
        """[bs, width] known-true candidate ids, target excluded, -1 pad."""
        out = np.full((len(keys_a), width), -1, dtype=np.int32)
        for i, (a, r, tgt) in enumerate(zip(keys_a, rels, targets)):
            known = [k for k in dct.get((int(a), int(r)), ())
                     if k != int(tgt)]
            out[i, : len(known)] = known[:width]
        return out

    def evaluate(self) -> "LinkPredictionEvaluator":
        kg, bs = self.kg, self.batch_size
        # fixed filter width across the run: one compile, exact ranks
        max_known = max(
            [len(v) for v in self.true_tails.values()]
            + [len(v) for v in self.true_heads.values()] + [1])
        width = max(8, int(2 ** np.ceil(np.log2(max_known))))
        ranks_t, ranks_h, f_ranks_t, f_ranks_h = [], [], [], []
        n = kg.n_facts
        for s in range(0, n, bs):
            # fixed batch shape (pad by wrap, trim after) -> single compile
            idx = np.arange(s, s + bs) % n
            m = min(bs, n - s)
            h = kg.head_idx[idx]
            r = kg.relations[idx]
            t = kg.tail_idx[idx]
            kt = self._pad_known(self.true_tails, h, r, t, width)
            kh = self._pad_known(self.true_heads, t, r, h, width)
            rt, ft = self._ranks_t_fn(self.params, jnp.asarray(h),
                                      jnp.asarray(r), jnp.asarray(t),
                                      jnp.asarray(kt))
            rh, fh = self._ranks_h_fn(self.params, jnp.asarray(t),
                                      jnp.asarray(r), jnp.asarray(h),
                                      jnp.asarray(kh))
            ranks_t.append(np.asarray(rt)[:m])
            ranks_h.append(np.asarray(rh)[:m])
            f_ranks_t.append(np.asarray(ft)[:m])
            f_ranks_h.append(np.asarray(fh)[:m])
        self.ranks_t = np.concatenate(ranks_t)
        self.ranks_h = np.concatenate(ranks_h)
        self.filt_ranks_t = np.concatenate(f_ranks_t)
        self.filt_ranks_h = np.concatenate(f_ranks_h)
        return self

    def mean_rank(self) -> Tuple[float, float]:
        raw = float(np.mean(np.concatenate([self.ranks_t, self.ranks_h])))
        filt = float(np.mean(np.concatenate([self.filt_ranks_t, self.filt_ranks_h])))
        return raw, filt

    def mrr(self) -> Tuple[float, float]:
        raw = float(np.mean(1.0 / np.concatenate([self.ranks_t, self.ranks_h])))
        filt = float(np.mean(1.0 / np.concatenate([self.filt_ranks_t,
                                                   self.filt_ranks_h])))
        return raw, filt

    def hit_at_k(self, k: int = 10) -> Tuple[float, float]:
        raw = float(np.mean(np.concatenate([self.ranks_t, self.ranks_h]) <= k))
        filt = float(np.mean(np.concatenate([self.filt_ranks_t,
                                             self.filt_ranks_h]) <= k))
        return raw, filt


class RelationPredictionEvaluator:
    """Rank all relations for each test triple (evaluation.py:16-200)."""

    def __init__(self, model: KGEModel, params, kg_test: KnowledgeGraph):
        self.model = model
        self.params = params
        self.kg = kg_test

    def evaluate(self, batch_size: int = 256) -> Dict[str, float]:
        kg = self.kg
        n_rel = kg.n_rel
        ranks = []
        for s in range(0, kg.n_facts, batch_size):
            h = kg.head_idx[s:s + batch_size]
            r = kg.relations[s:s + batch_size]
            t = kg.tail_idx[s:s + batch_size]
            B = len(h)
            hh = np.repeat(h, n_rel)
            tt = np.repeat(t, n_rel)
            rr = np.tile(np.arange(n_rel), B)
            scores = np.asarray(self.model.score(
                self.params, jnp.asarray(hh), jnp.asarray(rr),
                jnp.asarray(tt))).reshape(B, n_rel)
            ranks.append(_ranks_from_scores(scores, r))
        ranks = np.concatenate(ranks)
        return {"mean_rank": float(ranks.mean()),
                "mrr": float((1.0 / ranks).mean()),
                "hit@1": float((ranks <= 1).mean())}


class TripletClassificationEvaluator:
    """Per-relation decision thresholds from validation, accuracy on test
    (evaluation.py:428-530)."""

    def __init__(self, model: KGEModel, params, kg_val: KnowledgeGraph,
                 kg_test: KnowledgeGraph, seed: int = 0):
        self.model = model
        self.params = params
        self.kg_val = kg_val
        self.kg_test = kg_test
        self.rng = np.random.RandomState(seed)
        self.thresholds: Optional[np.ndarray] = None

    def _scores(self, kg: KnowledgeGraph, corrupt: bool) -> np.ndarray:
        h, r, t = kg.head_idx.copy(), kg.relations, kg.tail_idx.copy()
        if corrupt:
            mask = self.rng.rand(len(h)) < 0.5
            rand = self.rng.randint(0, kg.n_ent, len(h))
            h = np.where(mask, rand, h)
            t = np.where(mask, t, rand)
        return np.asarray(self.model.score(
            self.params, jnp.asarray(h), jnp.asarray(r), jnp.asarray(t)))

    def evaluate_thresholds(self) -> None:
        neg_scores = self._scores(self.kg_val, corrupt=True)
        # torchkge (evaluation.py:538) fills thresholds for relations unseen
        # in validation with the GLOBAL neg_scores.max(); per-relation maxima
        # override where the relation appears.
        self.thresholds = np.full(self.kg_val.n_rel, neg_scores.max())
        for rel in range(self.kg_val.n_rel):
            m = self.kg_val.relations == rel
            if m.any():
                self.thresholds[rel] = neg_scores[m].max()

    def accuracy(self) -> float:
        if self.thresholds is None:
            self.evaluate_thresholds()
        pos = self._scores(self.kg_test, corrupt=False)
        neg = self._scores(self.kg_test, corrupt=True)
        thr = self.thresholds[self.kg_test.relations]
        correct = (pos > thr).sum() + (neg <= thr).sum()
        return float(correct) / (2 * self.kg_test.n_facts)
