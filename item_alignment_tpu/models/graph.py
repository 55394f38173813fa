"""Graph model family: GCNII over the item/attribute graph.

Re-design of reference ``src/models/graph.py``:

- ``GCNII``       <- GCN (graph.py:12-44): Linear(feature_dim -> hidden) +
  L x GCN2Conv(alpha, theta, shared_weights=True, normalize=False) with
  dropout; adjacency comes pre-normalized (the reference loads ``adj_t.pt``)
- ``GCNTwoTower`` <- graph.py:47-132, with the per-pair python loop replaced
  by one gather + batched head (identical math, jit-friendly)

GCN2Conv layer l (Chen et al. 2020, PyG semantics with shared weights):
    h   = A_hat @ x
    s   = (1 - alpha) * h + alpha * x0
    out = (1 - beta_l) * s + beta_l * (s @ W_l),  beta_l = log(theta/l + 1)
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from item_alignment_tpu.config import ModelConfig
from item_alignment_tpu.models.heads import TwoTowerClassificationHead
from item_alignment_tpu.models.losses import pair_loss
from item_alignment_tpu.models.outputs import PairClassifierOutput
from item_alignment_tpu.ops.sparse import spmm


class GCN2Layer(nn.Module):
    features: int
    alpha: float
    beta: float
    edge_chunk: Optional[int] = None
    sorted_by_dst: bool = False

    @nn.compact
    def __call__(self, x, x0, edge_index, edge_weight, edge_transpose=None):
        n = x.shape[0]
        h = spmm(edge_index, edge_weight, x, n, edge_chunk=self.edge_chunk,
                 sorted_by_dst=self.sorted_by_dst, transpose=edge_transpose)
        support = (1.0 - self.alpha) * h + self.alpha * x0
        w = nn.Dense(self.features, use_bias=False, name="weight")(support)
        return (1.0 - self.beta) * support + self.beta * w


class _GCN2ScanBody(nn.Module):
    """One GCN2Conv step as a ``nn.scan`` body: carry = (x, x0, edges),
    per-iteration input = beta_l.  Scanning the layer stack makes the
    compiled program contain ONE layer body instead of L — at reference
    scale the unrolled fwd+bwd compile exceeds the remote-compile relay's
    time budget; the scanned form is the production path."""

    config: ModelConfig
    deterministic: bool

    @nn.compact
    def __call__(self, carry, beta):
        x, x0, edge_index, edge_weight, edge_transpose = carry
        cfg = self.config
        x = nn.Dropout(cfg.hidden_dropout_prob)(
            x, deterministic=self.deterministic)
        h = spmm(edge_index, edge_weight, x, x.shape[0],
                 edge_chunk=cfg.gcn_edge_chunk,
                 sorted_by_dst=cfg.gcn_sorted_edges,
                 transpose=edge_transpose)
        support = (1.0 - cfg.gcn_alpha) * h + cfg.gcn_alpha * x0
        w = nn.Dense(cfg.gcn_hidden, use_bias=False, name="weight")(support)
        x = jax.nn.relu((1.0 - beta) * support + beta * w)
        return (x, x0, edge_index, edge_weight, edge_transpose), None


class GCNII(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(self, features, edge_index, edge_weight,
                 edge_transpose=None, deterministic: bool = True):
        cfg = self.config
        drop = nn.Dropout(cfg.hidden_dropout_prob)
        x = drop(features, deterministic=deterministic)
        x = x0 = jax.nn.relu(nn.Dense(cfg.gcn_hidden, name="linear")(x))
        betas = [math.log(cfg.gcn_theta / (l + 1) + 1.0)
                 for l in range(cfg.gcn_layers)]
        if cfg.gcn_scan_layers:
            scanned = nn.scan(
                _GCN2ScanBody, variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=0, out_axes=0, length=cfg.gcn_layers)
            (x, *_), _ = scanned(cfg, deterministic, name="conv")(
                (x, x0, edge_index, edge_weight, edge_transpose),
                jnp.asarray(betas, jnp.float32))
        else:
            for layer in range(cfg.gcn_layers):
                x = drop(x, deterministic=deterministic)
                x = GCN2Layer(cfg.gcn_hidden, cfg.gcn_alpha, betas[layer],
                              edge_chunk=cfg.gcn_edge_chunk,
                              sorted_by_dst=cfg.gcn_sorted_edges,
                              name=f"conv_{layer}")(x, x0, edge_index,
                                                    edge_weight,
                                                    edge_transpose)
                x = jax.nn.relu(x)
        return drop(x, deterministic=deterministic)


class GCNTwoTower(nn.Module):
    """Full-graph node embedding, then pair classification by indexing node
    embeddings (one gather for the whole batch)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, features, edge_index, edge_weight, src_idx, tgt_idx,
                 labels=None, edge_transpose=None,
                 deterministic: bool = True):
        cfg = self.config
        node_embeddings = GCNII(cfg, name="encoder")(
            features, edge_index, edge_weight, edge_transpose, deterministic)
        src = node_embeddings[src_idx]
        tgt = node_embeddings[tgt_idx]
        src_embeds, tgt_embeds, logits, full_probs = TwoTowerClassificationHead(
            dropout_rate=cfg.hidden_dropout_prob, num_labels=cfg.num_labels,
            name="classifier")(src, tgt, deterministic)
        # reference quirk (graph.py:96-103): embeds <- prob columns
        src_embeds = full_probs[:, 0]
        tgt_embeds = full_probs[:, 1]
        probs = full_probs[:, 1]
        loss = None
        if labels is not None:
            loss = pair_loss(cfg.loss_type, logits, probs, labels,
                             src_embeds, tgt_embeds, cfg.loss_margin,
                             cfg.num_labels)
        return PairClassifierOutput(loss=loss, logits=logits, probs=probs,
                                    src_embeds=src_embeds, tgt_embeds=tgt_embeds)
