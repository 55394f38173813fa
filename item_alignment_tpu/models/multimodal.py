"""Multimodal model family (Flax Linen).

Re-designs of reference ``src/models/multimodal.py``:

- ``RobertaImageOneTower``  <- multimodal.py:213-320 (the winning multimodal
  model, v5): image embeddings spliced over ``[unused99]`` tokens
  (``ensemble=="begin"``) or concatenated at the head (``"end"``)
- ``RobertaImageTwoTower``  <- multimodal.py:323-461
- CoCa blocks               <- multimodal.py:465-706: bias-free LayerNorm,
  rotary embedding, SwiGLU, ParallelTransformerBlock (fused QKV+FF
  projection, multi-query attention), CrossAttention w/ parallel SwiGLU FF
- ``CoCaForPretraining``    <- multimodal.py:843-933: caption CE (labels =
  input shifted by 2, pad ignored) + symmetric contrastive loss with
  learned temperature; logits weight-tied to the word embeddings
- ``CoCaForItemAlignment``  <- multimodal.py:936-1045.  NB the reference
  builds ``embeds_2`` from ``text_tokens_1`` in the cross_attn branch
  (line 1013) — a bug we do not reproduce.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from item_alignment_tpu.config import ModelConfig
from item_alignment_tpu.models.embeddings import ImageSpliceEmbeddings
from item_alignment_tpu.models.encoder import TransformerEncoder
from item_alignment_tpu.models.heads import (
    TwoTowerClassificationHead,
    VecSimClassificationHead,
)
from item_alignment_tpu.models.image import ViT
from item_alignment_tpu.models.losses import (
    cross_entropy_loss,
    pair_loss,
)
from item_alignment_tpu.models.outputs import PairClassifierOutput
from item_alignment_tpu.models.text import RobertaBackbone, _OneTowerHead


# ------------------------------------------------- RoBERTa+image towers
class RobertaImageBackbone(nn.Module):
    """Image-splice embeddings + encoder (RobertaImageModel,
    multimodal.py:23-210)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, input_ids, image_embeds, attention_mask=None,
                 token_type_ids=None, position_ids=None, image_indices=None,
                 deterministic: bool = True):
        cfg = self.config
        hidden = ImageSpliceEmbeddings(cfg, name="embeddings")(
            input_ids, image_embeds, token_type_ids, position_ids,
            attention_mask, image_indices, deterministic)
        if cfg.dtype == "bfloat16":
            hidden = hidden.astype(jnp.bfloat16)
        states = TransformerEncoder(cfg, name="encoder")(
            hidden, attention_mask, deterministic)
        return [s.astype(jnp.float32) for s in states]


class RobertaImageOneTower(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(self, input_ids, src_image_embeds, tgt_image_embeds,
                 attention_mask=None, token_type_ids=None, position_ids=None,
                 image_indices=None, labels=None, deterministic: bool = True):
        cfg = self.config
        states = RobertaImageBackbone(cfg, name="roberta")(
            input_ids, (src_image_embeds, tgt_image_embeds), attention_mask,
            token_type_ids, position_ids, image_indices, deterministic)
        image_for_head = ((src_image_embeds, tgt_image_embeds)
                          if cfg.ensemble == "end" else None)
        return _OneTowerHead(cfg, tgt_cls_position=cfg.item_seq_len,
                             name="head")(states, labels,
                                          image_embeds=image_for_head,
                                          deterministic=deterministic)


class RobertaImageTwoTower(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(self, input_ids_1, image_embeds_1, input_ids_2,
                 image_embeds_2, attention_mask_1=None, attention_mask_2=None,
                 token_type_ids_1=None, token_type_ids_2=None, labels=None,
                 deterministic: bool = True):
        cfg = self.config
        backbone = RobertaImageBackbone(cfg, name="roberta")
        out_1 = backbone(input_ids_1, (image_embeds_1, image_embeds_1),
                         attention_mask_1, token_type_ids_1,
                         deterministic=deterministic)[-1]
        out_2 = backbone(input_ids_2, (image_embeds_2, image_embeds_2),
                         attention_mask_2, token_type_ids_2,
                         deterministic=deterministic)[-1]
        src_embeds, tgt_embeds, logits, probs = TwoTowerClassificationHead(
            dropout_rate=cfg.hidden_dropout_prob, num_labels=cfg.num_labels,
            name="classifier")(out_1[:, 0, :], out_2[:, 0, :], deterministic)
        loss = None
        if labels is not None:
            loss = pair_loss(cfg.loss_type, logits, probs[:, 1], labels,
                             src_embeds, tgt_embeds, cfg.loss_margin,
                             cfg.num_labels)
        return PairClassifierOutput(loss=loss, logits=logits, probs=probs[:, 1],
                                    src_embeds=src_embeds, tgt_embeds=tgt_embeds)


# --------------------------------------------------------- CoCa blocks
def rotary_freqs(n: int, dim: int) -> jax.Array:
    """[n, dim] rotary angles (multimodal.py:497-507)."""
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    freqs = jnp.einsum("i,j->ij", jnp.arange(n, dtype=jnp.float32), inv_freq)
    return jnp.concatenate((freqs, freqs), axis=-1)


def rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate((-x2, x1), axis=-1)


def apply_rotary_pos_emb(pos: jax.Array, t: jax.Array) -> jax.Array:
    return t * jnp.cos(pos) + rotate_half(t) * jnp.sin(pos)


def swiglu(x: jax.Array) -> jax.Array:
    x, gate = jnp.split(x, 2, axis=-1)
    return jax.nn.silu(gate) * x


def _ln(name, dtype=None):
    # bias-free (ref 475-482); dtype keeps the bf16 compute policy (flax
    # would otherwise promote back to fp32 against the fp32 scale param)
    return nn.LayerNorm(use_bias=False, dtype=dtype, name=name)


class ParallelTransformerBlock(nn.Module):
    """Fused attention+FF block (PaLM-style), multi-query attention, rotary
    positions, optional causal mask; residual applied by the caller's
    ``x + block(x)`` just like the reference's Residual wrapper."""

    dim: int
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    is_decoding: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, attn_mask: Optional[jax.Array] = None):
        B, N, _ = x.shape
        h, dh = self.heads, self.dim_head
        attn_inner = h * dh
        ff_inner = self.dim * self.ff_mult

        y = _ln("norm", self.dtype)(x)
        fused = nn.Dense(attn_inner + 2 * dh + 2 * ff_inner, use_bias=False,
                         dtype=self.dtype, name="fused_attn_ff_proj")(y)
        q, k, v, ff = jnp.split(
            fused, [attn_inner, attn_inner + dh, attn_inner + 2 * dh], axis=-1)
        q = q.reshape(B, N, h, dh).transpose(0, 2, 1, 3)  # [B,h,N,dh]

        pos = rotary_freqs(N, dh)
        q = apply_rotary_pos_emb(pos, q)
        k = apply_rotary_pos_emb(pos, k)  # [B,N,dh] single kv head

        q = q * (dh ** -0.5)
        sim = jnp.einsum("bhid,bjd->bhij", q, k)
        if self.is_decoding:
            causal = jnp.triu(jnp.ones((N, N), bool), k=1)
            sim = jnp.where(causal, jnp.finfo(sim.dtype).min, sim)
        if attn_mask is not None:
            sim = jnp.where(attn_mask[:, None, :, :], sim,
                            jnp.finfo(sim.dtype).min)
        sim = sim - jax.lax.stop_gradient(jnp.max(sim, -1, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, attn_inner)
        out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                       name="attn_out")(out)
        ff_out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                          name="ff_out")(swiglu(ff))
        return out + ff_out


class CrossAttention(nn.Module):
    """Multi-query cross attention w/ optional parallel SwiGLU FF
    (multimodal.py:630-706); residual applied by the caller."""

    dim: int
    dim_head: int = 64
    heads: int = 8
    parallel_ff: bool = False
    ff_mult: int = 4
    norm_context: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, context):
        B, N, _ = x.shape
        h, dh = self.heads, self.dim_head
        inner = h * dh
        y = _ln("norm", self.dtype)(x)
        ctx = (_ln("context_norm", self.dtype)(context)
               if self.norm_context else context)

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(y)
        q = q.reshape(B, N, h, dh).transpose(0, 2, 1, 3) * (dh ** -0.5)
        kv = nn.Dense(2 * dh, use_bias=False, dtype=self.dtype,
                      name="to_kv")(ctx)
        k, v = jnp.split(kv, 2, axis=-1)

        sim = jnp.einsum("bhid,bjd->bhij", q, k)
        sim = sim - jnp.max(sim, -1, keepdims=True)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, inner)
        out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                       name="to_out")(out)
        if self.parallel_ff:
            ff = nn.Dense(2 * self.dim * self.ff_mult, use_bias=False,
                          dtype=self.dtype, name="ff_in")(y)
            out = out + nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                                 name="ff_out")(swiglu(ff))
        return out


class MultimodalDecoder(nn.Module):
    """N x (ParallelTransformerBlock + CrossAttention), residual each."""

    config: ModelConfig
    is_decoding: bool = True

    @nn.compact
    def __call__(self, text_tokens, image_tokens):
        cfg = self.config
        dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else None
        if dt is not None:
            text_tokens = text_tokens.astype(dt)
            image_tokens = image_tokens.astype(dt)
        for i in range(cfg.multimodal_depth):
            text_tokens = text_tokens + ParallelTransformerBlock(
                dim=cfg.hidden_size, dim_head=cfg.hidden_size // cfg.coca_heads,
                heads=cfg.coca_heads, ff_mult=cfg.ff_mult,
                is_decoding=self.is_decoding, dtype=dt,
                name=f"attn_ff_{i}")(text_tokens)
            text_tokens = text_tokens + CrossAttention(
                dim=cfg.hidden_size, dim_head=cfg.hidden_size // cfg.coca_heads,
                heads=cfg.coca_heads, parallel_ff=True, ff_mult=cfg.ff_mult,
                dtype=dt, name=f"cross_attn_{i}")(text_tokens, image_tokens)
        return text_tokens.astype(jnp.float32)


class CoCaModel(nn.Module):
    """Text encoder (RoBERTa) + image encoder (ViT) -> embeds + tokens
    (multimodal.py:709-840)."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        self.text_encoder = RobertaBackbone(cfg, name="text_encoder")
        # config-shaped image tower like the reference's ViT(config)
        # (coca_pretrain.py:133, image.py:382-396): coca_large gets a
        # 24-layer/1024-dim/16-head encoder, coca_base a 12-layer one
        self.img_encoder = ViT(
            image_size=cfg.image_size, patch_size=cfg.patch_size,
            dim=cfg.hidden_size, depth=cfg.num_hidden_layers,
            heads=cfg.num_attention_heads,
            mlp_ratio=cfg.intermediate_size / cfg.hidden_size,
            name="img_encoder")

    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 position_ids=None, images=None, deterministic: bool = True):
        text_tokens = self.text_encoder(
            input_ids, attention_mask, token_type_ids, position_ids,
            deterministic=deterministic)[-1]
        text_embeds = text_tokens[:, 0]
        image_embeds = image_tokens = None
        if images is not None:
            image_embeds, image_tokens = self.img_encoder(images, deterministic)
        return text_embeds, text_tokens, image_embeds, image_tokens


class CoCaForPretraining(nn.Module):
    """Caption + contrastive pretraining (multimodal.py:843-933).

    Caption loss: logits weight-tied to the word-embedding table; labels
    default to the input shifted by 2 positions (pad ignored).  Contrastive:
    symmetric InfoNCE over (text CLS, image CLS) with learned temperature.
    """

    config: ModelConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 position_ids=None, images=None, labels=None,
                 deterministic: bool = True):
        cfg = self.config
        coca = CoCaModel(cfg, name="coca")

        if labels is None:
            labels = input_ids[:, 2:]
            crop = lambda a: None if a is None else a[:, :-1]  # noqa: E731
            input_ids = crop(input_ids)
            attention_mask = crop(attention_mask)
            token_type_ids = crop(token_type_ids)
            position_ids = crop(position_ids)

        text_embeds, text_tokens, image_embeds, image_tokens = coca(
            input_ids, attention_mask, token_type_ids, position_ids, images,
            deterministic)

        text_tokens = MultimodalDecoder(cfg, is_decoding=True,
                                        name="multimodal")(text_tokens,
                                                           image_tokens)
        x = _ln("logits_norm")(text_tokens)
        # weight tying: reuse the text encoder's word-embedding table
        word_emb = self.variables["params"]["coca"]["text_encoder"][
            "embeddings"]["word_embeddings"]["embedding"]
        logits = x @ word_emb.T  # [B, N, V]

        # caption CE, predicting labels[:, t] from position t (input shifted
        # by 2), pad positions ignored
        T = labels.shape[1]
        logp = jax.nn.log_softmax(logits[:, :T].astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32),
                                   axis=-1)[..., 0]
        mask = (labels != cfg.pad_token_id).astype(jnp.float32)
        caption_loss = jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        caption_loss = caption_loss * cfg.caption_loss_weight

        temperature = self.param("temperature", nn.initializers.ones, (1,))
        sim = jnp.einsum("id,jd->ij", text_embeds, image_embeds)
        sim = sim * jnp.exp(temperature)
        B = sim.shape[0]
        contrastive_labels = jnp.arange(B)
        contrastive_loss = 0.5 * (
            cross_entropy_loss(sim, contrastive_labels)
            + cross_entropy_loss(sim.T, contrastive_labels))
        contrastive_loss = contrastive_loss * cfg.contrastive_loss_weight

        return caption_loss + contrastive_loss


class CoCaForItemAlignment(nn.Module):
    """Pair model over CoCa towers: ``ensemble == "sum"`` adds text+image
    CLS embeds; ``"cross_attn"`` runs the non-causal multimodal stack and
    takes token 0 (multimodal.py:936-1045, with the embeds_2 bug fixed)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, input_ids_1, images_1, input_ids_2, images_2,
                 attention_mask_1=None, attention_mask_2=None,
                 token_type_ids_1=None, token_type_ids_2=None, labels=None,
                 deterministic: bool = True):
        cfg = self.config
        coca = CoCaModel(cfg, name="coca")
        te1, tt1, ie1, it1 = coca(input_ids_1, attention_mask_1,
                                  token_type_ids_1, images=images_1,
                                  deterministic=deterministic)
        te2, tt2, ie2, it2 = coca(input_ids_2, attention_mask_2,
                                  token_type_ids_2, images=images_2,
                                  deterministic=deterministic)

        if cfg.ensemble == "cross_attn":
            decoder = MultimodalDecoder(cfg, is_decoding=False,
                                        name="multimodal")
            embeds_1 = decoder(tt1, it1)[:, 0]
            embeds_2 = decoder(tt2, it2)[:, 0]
        else:  # "sum"
            embeds_1 = te1 + ie1
            embeds_2 = te2 + ie2

        if cfg.classification_method == "vec_sim":
            src_embeds, tgt_embeds, logits, probs = VecSimClassificationHead(
                cfg, name="classifier")(embeds_1, embeds_2, deterministic)
        else:
            src_embeds, tgt_embeds, logits, full_probs = \
                TwoTowerClassificationHead(
                    dropout_rate=cfg.hidden_dropout_prob,
                    num_labels=cfg.num_labels, name="classifier")(
                        embeds_1, embeds_2, deterministic)
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
