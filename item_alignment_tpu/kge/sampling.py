"""Negative sampling for KGE training.

Equivalents of torchkge's samplers (``sampling.py:16-591``), expressed as
pure ``jax.random`` ops so whole-KG corruption (``corrupt_kg``) is one
vectorized call instead of a DataLoader loop:

- Uniform: corrupt head or tail with prob 0.5
- Bernoulli (Wang et al. 2014): per-relation head-corruption probability
  tph/(tph+hpt) (``utils/operations.py:123-150``)
"""

from __future__ import annotations

from collections import defaultdict
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from item_alignment_tpu.kge.graph import KnowledgeGraph


def bernoulli_probs(kg: KnowledgeGraph) -> np.ndarray:
    """Per-relation P(corrupt head) = tph / (tph + hpt); 0.5 for unseen."""
    heads_per_rel = defaultdict(lambda: defaultdict(set))
    tails_per_rel = defaultdict(lambda: defaultdict(set))
    for h, r, t in zip(kg.head_idx, kg.relations, kg.tail_idx):
        heads_per_rel[int(r)][int(t)].add(int(h))
        tails_per_rel[int(r)][int(h)].add(int(t))
    probs = np.full(kg.n_rel, 0.5, dtype=np.float32)
    for r in range(kg.n_rel):
        if r in tails_per_rel and len(tails_per_rel[r]):
            tph = np.mean([len(s) for s in tails_per_rel[r].values()])
            hpt = np.mean([len(s) for s in heads_per_rel[r].values()])
            probs[r] = tph / (tph + hpt)
    return probs


class UniformNegativeSampler:
    def __init__(self, kg: KnowledgeGraph, n_neg: int = 1):
        self.kg = kg
        self.n_neg = n_neg
        self.n_ent = kg.n_ent

    def _head_corruption_prob(self, relations: jnp.ndarray) -> jnp.ndarray:
        return jnp.full(relations.shape, 0.5, jnp.float32)

    def corrupt_batch(self, rng, heads, tails, relations,
                      n_neg: Optional[int] = None
                      ) -> Tuple[jax.Array, jax.Array]:
        """Tile each fact n_neg times and corrupt head OR tail per sample.
        Corrupted ids are drawn from [1, n_ent) as in the reference
        (sampling.py:208-216)."""
        n_neg = n_neg or self.n_neg
        heads = jnp.tile(jnp.asarray(heads), n_neg)
        tails = jnp.tile(jnp.asarray(tails), n_neg)
        relations = jnp.tile(jnp.asarray(relations), n_neg)
        k1, k2 = jax.random.split(rng)
        p = self._head_corruption_prob(relations)
        corrupt_head = jax.random.bernoulli(k1, p)
        rand_ent = jax.random.randint(k2, heads.shape, 1, self.n_ent)
        neg_heads = jnp.where(corrupt_head, rand_ent, heads)
        neg_tails = jnp.where(corrupt_head, tails, rand_ent)
        return neg_heads, neg_tails

    def corrupt_kg(self, rng, n_neg: Optional[int] = None
                   ) -> Tuple[np.ndarray, np.ndarray]:
        """Whole-graph corruption in one vectorized op (host arrays)."""
        nh, nt = self.corrupt_kg_device(rng, n_neg)
        return np.asarray(nh), np.asarray(nt)

    def corrupt_kg_device(self, rng, n_neg: Optional[int] = None):
        """Whole-graph corruption, result left ON DEVICE — the training loop
        consumes it there; downloading 2x n_facts*n_neg int32 through a
        remote-TPU tunnel costs seconds per epoch."""
        return self.corrupt_batch(rng, self.kg.head_idx, self.kg.tail_idx,
                                  self.kg.relations, n_neg)


class BernoulliNegativeSampler(UniformNegativeSampler):
    def __init__(self, kg: KnowledgeGraph, n_neg: int = 1):
        super().__init__(kg, n_neg)
        self.bern_probs = jnp.asarray(bernoulli_probs(kg))

    def _head_corruption_prob(self, relations: jnp.ndarray) -> jnp.ndarray:
        return self.bern_probs[relations]


class PositionalNegativeSampler(BernoulliNegativeSampler):
    """Socher et al. 2011: corrupted entities are drawn only from those
    observed in the same position for the same relation
    (torchkge sampling.py:330-591), with Bernoulli head/tail choice.

    The per-(relation, position) candidate pools are padded to a fixed
    width so sampling is a single vectorized gather.
    """

    def __init__(self, kg: KnowledgeGraph, n_neg: int = 1,
                 max_pool: int = 64):
        super().__init__(kg, n_neg)
        heads_pool = [[] for _ in range(kg.n_rel)]
        tails_pool = [[] for _ in range(kg.n_rel)]
        for h, r, t in zip(kg.head_idx, kg.relations, kg.tail_idx):
            heads_pool[int(r)].append(int(h))
            tails_pool[int(r)].append(int(t))

        def pad(pools):
            table = np.zeros((kg.n_rel, max_pool), np.int32)
            sizes = np.ones(kg.n_rel, np.int32)
            for r, pool in enumerate(pools):
                uniq = sorted(set(pool)) or [0]
                k = min(len(uniq), max_pool)
                table[r, :k] = uniq[:k]
                if k < max_pool:
                    table[r, k:] = table[r, 0]
                sizes[r] = k
            return jnp.asarray(table), jnp.asarray(sizes)

        self.head_table, self.head_sizes = pad(heads_pool)
        self.tail_table, self.tail_sizes = pad(tails_pool)

    def corrupt_batch(self, rng, heads, tails, relations, n_neg=None):
        n_neg = n_neg or self.n_neg
        heads = jnp.tile(jnp.asarray(heads), n_neg)
        tails = jnp.tile(jnp.asarray(tails), n_neg)
        relations = jnp.tile(jnp.asarray(relations), n_neg)
        k1, k2 = jax.random.split(rng)
        corrupt_head = jax.random.bernoulli(
            k1, self._head_corruption_prob(relations))
        u = jax.random.uniform(k2, heads.shape)
        h_pick = (u * self.head_sizes[relations]).astype(jnp.int32)
        t_pick = (u * self.tail_sizes[relations]).astype(jnp.int32)
        rand_heads = self.head_table[relations, h_pick]
        rand_tails = self.tail_table[relations, t_pick]
        neg_heads = jnp.where(corrupt_head, rand_heads, heads)
        neg_tails = jnp.where(corrupt_head, tails, rand_tails)
        return neg_heads, neg_tails
