"""Embedding variants (Flax Linen).

Re-designs of reference ``src/models/base.py``:

- ``RobertaEmbeddings``      <- base.py:205-296 (word+position+token_type,
  RoBERTa pad-aware position ids, LayerNorm+dropout)
- ``PKGMEmbeddings``         <- RobertaPKGMEmbeddings (base.py:299-459): text
  word embeddings + PKGM "service" queries — triple query h+r and relation
  query M.h - r — expanded to 2*max_pvs kg tokens per item.
- ``ImageSpliceEmbeddings``  <- RobertaImageEmbeddings (base.py:462-573): the
  per-sample python splice loop (base.py:534-541) becomes a vectorized
  one-hot scatter so it jits with static shapes.

ID-space vs embedded-space (PKGM): the dataset emits per item
``max_seq_len`` text ids + ``1 + max_pvs`` kg ids, while attention masks /
token types / position ids cover the *embedded* length
``max_seq_len + 2*max_pvs`` (each relation becomes two query tokens;
reference ``data.py:378-388``).  Note the reference's PKGM pooler indexes the
tgt [CLS] at the id-space offset (``text.py:105-124``); we use the correct
embedded-space offset ``max_seq_len + 2*max_pvs``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from item_alignment_tpu.config import ModelConfig
from item_alignment_tpu.ops.dropout import ReplayDropout


def create_position_ids(input_ids: jax.Array, padding_idx: int) -> jax.Array:
    """RoBERTa pad-aware position ids (reference ``base.py:189-202``)."""
    mask = (input_ids != padding_idx).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + padding_idx


class EmbedPostprocess(nn.Module):
    """token_type + position add, LayerNorm, dropout (shared tail)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, inputs_embeds, token_type_ids, position_ids,
                 deterministic: bool = True):
        cfg = self.config
        tte = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                       name="token_type_embeddings",
                       embedding_init=nn.initializers.normal(cfg.initializer_range))
        pe = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                      name="position_embeddings",
                      embedding_init=nn.initializers.normal(cfg.initializer_range))
        x = inputs_embeds + tte(token_type_ids) + pe(position_ids)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm")(x)
        # mask regenerated in the backward, not saved (ops/dropout.py)
        x = ReplayDropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)
        return x


class RobertaEmbeddings(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        token_type_ids: Optional[jax.Array] = None,
        position_ids: Optional[jax.Array] = None,
        cate_ids: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.config
        if position_ids is None:
            position_ids = create_position_ids(input_ids, cfg.pad_token_id)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        we = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="word_embeddings",
                      embedding_init=nn.initializers.normal(cfg.initializer_range))
        embeds = we(input_ids)
        if cate_ids is not None:
            # category-embedding hook (reference base.py:274-276; table
            # commented out upstream at base.py:216 — functional here when
            # config.cate_size is set and the dataset supplies cate_ids)
            assert cfg.cate_size, "cate_ids passed but config.cate_size unset"
            ce = nn.Embed(cfg.cate_size, cfg.hidden_size,
                          name="cate_embeddings",
                          embedding_init=nn.initializers.normal(
                              cfg.initializer_range))
            embeds = embeds + ce(cate_ids)
        return EmbedPostprocess(cfg, name="post")(
            embeds, token_type_ids, position_ids, deterministic)


class PKGMEmbeddings(nn.Module):
    """Text + knowledge-graph query embeddings.

    Input id layout per item: ``[text ids (max_seq_len)] [entity id]
    [relation ids (max_pvs)]``; one-tower input is src then tgt.
    Output per item: ``max_seq_len + 2*max_pvs`` embedded tokens
    (triple queries h+r then relation queries M.h - r).
    """

    config: ModelConfig

    def setup(self):
        cfg = self.config
        init = nn.initializers.normal(cfg.initializer_range)
        self.word_embeddings = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                                        name="word_embeddings", embedding_init=init)
        self.ent_emb = nn.Embed(cfg.num_entities, cfg.kg_embedding_dim,
                                name="ent_emb", embedding_init=init)
        self.rel_emb = nn.Embed(cfg.num_relations, cfg.kg_embedding_dim,
                                name="rel_emb", embedding_init=init)
        self.proj_mat = nn.Dense(cfg.kg_embedding_dim,
                                 use_bias=cfg.entity_projection_bias,
                                 name="proj_mat")
        if cfg.kg_embedding_dim != cfg.hidden_size:
            self.ent_projector = nn.Dense(cfg.hidden_size, name="ent_projector")
            self.rel_projector = nn.Dense(cfg.hidden_size, name="rel_projector")
            self.proj_projector = nn.Dense(cfg.hidden_size, name="proj_projector")
        else:
            self.ent_projector = self.rel_projector = self.proj_projector = None
        self.post = EmbedPostprocess(cfg, name="post")

    def _item_kg_embeds(self, entity_ids, relation_ids):
        """entity_ids [B], relation_ids [B, P] -> [B, 2P, H]."""
        h = self.ent_emb(entity_ids[:, None])  # [B,1,D]
        if self.config.kg_entity_normalize == "l2":
            # the presumably-intended semantics: unit L2 norm over the
            # embedding dim (torchkge normalize_parameters does this)
            h = h / jnp.maximum(
                jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
        else:
            # reference-exact (base.py:358): F.normalize with torch's
            # DEFAULT dim=1 over the [B, 1, D] entity slice — a norm over
            # the singleton axis, i.e. elementwise x / max(|x|, 1e-12)
            # (sign-like).  Reproduced so converted checkpoints match the
            # torch logits; opt into the fix with
            # config.kg_entity_normalize="l2".
            h = h / jnp.maximum(jnp.abs(h), 1e-12)
        r = self.rel_emb(relation_ids)         # [B,P,D]
        h_proj = self.proj_mat(h)
        if self.ent_projector is not None:
            h = self.ent_projector(h)
            r = self.rel_projector(r)
            h_proj = self.proj_projector(h_proj)
        triple_query = h + r            # [B,P,H]
        relation_query = h_proj - r     # [B,P,H]
        return jnp.concatenate((triple_query, relation_query), axis=1)

    def _split_item(self, item_ids):
        cfg = self.config
        L = cfg.max_seq_len
        text_ids = item_ids[:, :L]
        entity_ids = item_ids[:, L]
        relation_ids = item_ids[:, L + 1: L + 1 + cfg.max_pvs]
        return jnp.concatenate(
            (self.word_embeddings(text_ids),
             self._item_kg_embeds(entity_ids, relation_ids)), axis=1)

    def __call__(
        self,
        input_ids: jax.Array,
        token_type_ids: Optional[jax.Array] = None,
        position_ids: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.config
        item_id_len = cfg.max_seq_len + cfg.max_pvs + 1
        if cfg.interaction_type == "one_tower":
            src = self._split_item(input_ids[:, :item_id_len])
            tgt = self._split_item(input_ids[:, item_id_len:])
            embeds = jnp.concatenate((src, tgt), axis=1)
        else:
            embeds = self._split_item(input_ids)
        B, L, _ = embeds.shape
        if position_ids is None:
            # dataset emits explicit 0..L-1 positions (data.py:347,415)
            position_ids = jnp.tile(jnp.arange(L, dtype=jnp.int32)[None, :], (B, 1))
        if token_type_ids is None:
            token_type_ids = jnp.zeros((B, L), jnp.int32)
        return self.post(embeds, token_type_ids, position_ids, deterministic)


class ImageSpliceEmbeddings(nn.Module):
    """RoBERTa embeddings with projected image embeddings spliced over the
    ``[unused99]`` image-token positions (``ensemble == "begin"``).

    ``image_indices`` holds, per sample, the token positions to overwrite:
    position 1 always carries the src image; for one-tower, a second
    per-sample position carries the tgt image.  The reference's python loop
    (base.py:534-541) is replaced by a one-hot blend over the sequence axis.
    """

    config: ModelConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,                 # [B, S]
        image_embeds: Tuple[jax.Array, jax.Array],  # each [B, image_hidden]
        token_type_ids: Optional[jax.Array] = None,
        position_ids: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
        image_indices: Optional[jax.Array] = None,  # [B] tgt image position
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.config
        B, S = input_ids.shape
        if position_ids is None:
            # reference derives positions from the attention mask (base.py:506-510)
            src = attention_mask if attention_mask is not None else input_ids
            position_ids = create_position_ids(src, cfg.pad_token_id)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)

        init = nn.initializers.normal(cfg.initializer_range)
        we = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="word_embeddings",
                      embedding_init=init)
        txt = we(input_ids)  # [B,S,H]

        if cfg.ensemble == "begin":
            img2txt = nn.Dense(cfg.hidden_size, name="img2txt")
            src_img = img2txt(image_embeds[0])  # [B,H]
            pos = jnp.arange(S)[None, :]
            src_onehot = (pos == 1).astype(txt.dtype)[..., None]      # [B,S,1]
            txt = txt * (1 - src_onehot) + src_onehot * src_img[:, None, :]
            if cfg.interaction_type == "one_tower":
                tgt_img = img2txt(image_embeds[1])
                tgt_onehot = (pos == image_indices[:, None]).astype(txt.dtype)[..., None]
                txt = txt * (1 - tgt_onehot) + tgt_onehot * tgt_img[:, None, :]

        return EmbedPostprocess(cfg, name="post")(
            txt, token_type_ids, position_ids, deterministic)
