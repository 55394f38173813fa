"""Text model family (Flax Linen).

Re-designs of reference ``src/models/text.py``:

- ``RobertaOneTower``  <- text.py:1379-1492 (the flagship cross-encoder)
- ``RobertaTwoTower``  <- text.py:1269-1376
- ``PKGMOneTower``     <- text.py:691-783
- ``PKGMTwoTower``     <- text.py:292-391
- ``TextCNN(TwoTower)``<- text.py:1496-1609

All return :class:`PairClassifierOutput` (loss, logits, probs, src/tgt embeds).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from item_alignment_tpu.config import ModelConfig
from item_alignment_tpu.models.embeddings import (
    PKGMEmbeddings,
    RobertaEmbeddings,
    create_position_ids,
)
from item_alignment_tpu.models.encoder import TransformerEncoder
from item_alignment_tpu.models.heads import (
    AuxiliaryPairHead,
    ClsClassificationHead,
    TwoTowerClassificationHead,
    VecSimClassificationHead,
    masked_cross_entropy,
)
from item_alignment_tpu.models.losses import pair_loss
from item_alignment_tpu.models.outputs import PairClassifierOutput


def combine_cls_layers(states, cls_layers, cls_pool):
    """Select the last-k hidden states and combine (text.py:1452-1456).

    ``cls_layers`` follows the reference convention: 1 = last layer,
    2 = second-to-last, ...
    """
    selected = [states[-int(i)] for i in cls_layers]
    if cls_pool == "avg":
        return jnp.mean(jnp.stack(selected), axis=0)
    return jnp.concatenate(selected, axis=-1)


class RobertaBackbone(nn.Module):
    """Embeddings + encoder, returns all hidden states."""

    config: ModelConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 position_ids=None, cate_ids=None, deterministic: bool = True):
        cfg = self.config
        hidden = RobertaEmbeddings(cfg, name="embeddings")(
            input_ids, token_type_ids, position_ids, cate_ids, deterministic)
        if cfg.dtype == "bfloat16":
            hidden = hidden.astype(jnp.bfloat16)
        states = TransformerEncoder(cfg, name="encoder")(
            hidden, attention_mask, deterministic)
        return [s.astype(jnp.float32) for s in states]


class _OneTowerHead(nn.Module):
    """Shared one-tower head + loss logic (text.py:1452-1492)."""

    config: ModelConfig
    tgt_cls_position: int

    @nn.compact
    def __call__(self, states, labels=None, pair_spans=None,
                 image_embeds=None, deterministic: bool = True):
        cfg = self.config
        seq_out = combine_cls_layers(states, cfg.cls_layers, cfg.cls_pool)

        if cfg.classification_method == "vec_sim":
            src_vec = seq_out[:, 0, :]
            tgt_vec = seq_out[:, self.tgt_cls_position, :]
            src_embeds, tgt_embeds, logits, probs = VecSimClassificationHead(
                cfg, name="classifier")(src_vec, tgt_vec, deterministic)
        else:
            logits = ClsClassificationHead(cfg, name="classifier")(
                seq_out, image_embeds=image_embeds, deterministic=deterministic)
            full_probs = jax.nn.softmax(logits, axis=-1)
            # reference quirk (text.py:1464-1466): embeds are the two prob
            # columns, probs is P(label=1)
            src_embeds = full_probs[:, 0]
            tgt_embeds = full_probs[:, 1]
            probs = full_probs[:, 1]

        loss = None
        if labels is not None:
            loss = pair_loss(cfg.loss_type, logits, probs, labels,
                             src_embeds, tgt_embeds, cfg.loss_margin,
                             cfg.num_labels)
            if cfg.auxiliary_task and pair_spans is not None:
                aux_logits, aux_labels, valid = AuxiliaryPairHead(
                    cfg, name="auxiliary_task")(seq_out, pair_spans, deterministic)
                loss = loss + masked_cross_entropy(aux_logits, aux_labels, valid)

        return PairClassifierOutput(loss=loss, logits=logits, probs=probs,
                                    src_embeds=src_embeds, tgt_embeds=tgt_embeds)


class RobertaOneTower(nn.Module):
    """Pair cross-encoder: ``[CLS] src [SEP] tgt [SEP]`` (cls) or
    ``src-padded [BOS] tgt-padded`` (vec_sim)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 position_ids=None, cate_ids=None, labels=None,
                 pair_spans=None, deterministic: bool = True):
        cfg = self.config
        states = RobertaBackbone(cfg, name="roberta")(
            input_ids, attention_mask, token_type_ids, position_ids,
            cate_ids, deterministic)
        return _OneTowerHead(cfg, tgt_cls_position=cfg.item_seq_len,
                             name="head")(states, labels, pair_spans,
                                          deterministic=deterministic)


class RobertaTwoTower(nn.Module):
    """Two shared-weight encoder passes; CLS pair -> two-tower head."""

    config: ModelConfig

    @nn.compact
    def __call__(self, input_ids_1, input_ids_2, attention_mask_1=None,
                 attention_mask_2=None, token_type_ids_1=None,
                 token_type_ids_2=None, cate_ids_1=None, cate_ids_2=None,
                 labels=None, deterministic: bool = True):
        cfg = self.config
        backbone = RobertaBackbone(cfg, name="roberta")
        out_1 = backbone(input_ids_1, attention_mask_1, token_type_ids_1,
                         cate_ids=cate_ids_1, deterministic=deterministic)[-1]
        out_2 = backbone(input_ids_2, attention_mask_2, token_type_ids_2,
                         cate_ids=cate_ids_2, deterministic=deterministic)[-1]
        src_embeds, tgt_embeds, logits, full_probs = TwoTowerClassificationHead(
            dropout_rate=cfg.hidden_dropout_prob, num_labels=cfg.num_labels,
            name="classifier")(out_1[:, 0, :], out_2[:, 0, :], deterministic)
        probs = full_probs[:, 1]  # P(same); embeds stay the CLS vectors
        loss = None
        if labels is not None:
            loss = pair_loss(cfg.loss_type, logits, probs, labels,
                             src_embeds, tgt_embeds, cfg.loss_margin, cfg.num_labels)
        return PairClassifierOutput(loss=loss, logits=logits, probs=probs,
                                    src_embeds=src_embeds, tgt_embeds=tgt_embeds)


class PKGMBackbone(nn.Module):
    """PKGM embeddings + encoder (RobertaPKGMModel, text.py:128-289)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 position_ids=None, deterministic: bool = True):
        cfg = self.config
        hidden = PKGMEmbeddings(cfg, name="embeddings")(
            input_ids, token_type_ids, position_ids, deterministic)
        if cfg.dtype == "bfloat16":
            hidden = hidden.astype(jnp.bfloat16)
        states = TransformerEncoder(cfg, name="encoder")(
            hidden, attention_mask, deterministic)
        return [s.astype(jnp.float32) for s in states]


class PKGMOneTower(nn.Module):
    """One-tower pair classifier over the PKGM encoder (text.py:691-783).

    The embedded tgt [CLS] sits at ``max_seq_len + 2*max_pvs`` (the
    reference's pooler uses the id-space offset ``max_seq_len+max_pvs+1``,
    text.py:105-124 — an embedded/id space mix-up we do not reproduce).
    """

    config: ModelConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 position_ids=None, labels=None, deterministic: bool = True):
        cfg = self.config
        states = PKGMBackbone(cfg, name="roberta")(
            input_ids, attention_mask, token_type_ids, position_ids, deterministic)
        tgt_cls = cfg.max_seq_len + 2 * cfg.max_pvs
        return _OneTowerHead(cfg, tgt_cls_position=tgt_cls, name="head")(
            states, labels, deterministic=deterministic)


class PKGMTwoTower(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(self, input_ids_1, input_ids_2, attention_mask_1=None,
                 attention_mask_2=None, token_type_ids_1=None,
                 token_type_ids_2=None, position_ids=None, labels=None,
                 deterministic: bool = True):
        cfg = self.config
        backbone = PKGMBackbone(cfg, name="roberta")
        out_1 = backbone(input_ids_1, attention_mask_1, token_type_ids_1,
                         position_ids, deterministic)[-1]
        out_2 = backbone(input_ids_2, attention_mask_2, token_type_ids_2,
                         position_ids, deterministic)[-1]
        src_embeds, tgt_embeds, logits, full_probs = TwoTowerClassificationHead(
            dropout_rate=cfg.hidden_dropout_prob, num_labels=cfg.num_labels,
            name="classifier")(out_1[:, 0, :], out_2[:, 0, :], deterministic)
        probs = full_probs[:, 1]
        loss = None
        if labels is not None:
            loss = pair_loss(cfg.loss_type, logits, probs, labels,
                             src_embeds, tgt_embeds, cfg.loss_margin, cfg.num_labels)
        return PairClassifierOutput(loss=loss, logits=logits, probs=probs,
                                    src_embeds=src_embeds, tgt_embeds=tgt_embeds)


class TextCNN(nn.Module):
    """Two-channel (trainable + frozen embedding) TextCNN (text.py:1496-1546).

    The reference's frozen second channel is expressed with
    ``jax.lax.stop_gradient`` over a second embedding table so both tables
    can be initialised from the same pretrained weights.
    Conv2d(2, F, (K, H)) over the stacked channels == sum of two 1D convs;
    implemented as feature-dim concat -> Conv with window K.
    """

    config: ModelConfig

    @nn.compact
    def __call__(self, input_ids, deterministic: bool = True):
        cfg = self.config
        emb1 = RobertaEmbeddings(cfg, name="embedding1")(
            input_ids, deterministic=deterministic)
        emb2 = RobertaEmbeddings(cfg, name="embedding2")(
            input_ids, deterministic=deterministic)
        emb2 = jax.lax.stop_gradient(emb2)
        # [B, S, 2H]: channel concat; a conv window of (K, hidden) over 2
        # channels is equivalent to convolving the concatenated features.
        x = jnp.concatenate((emb1, emb2), axis=-1)
        outs = []
        for ksize in cfg.filter_sizes:
            c = nn.Conv(cfg.num_filters, kernel_size=(ksize,), padding="VALID",
                        name=f"conv_{ksize}")(x)  # [B, S-K+1, F]
            c = jax.nn.relu(c)
            outs.append(jnp.max(c, axis=1))  # global max pool
        feat = jnp.concatenate(outs, axis=-1)
        feat = nn.Dropout(cfg.hidden_dropout_prob)(feat, deterministic=deterministic)
        return feat


class TextCNNTwoTower(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(self, input_ids_1, input_ids_2, labels=None,
                 attention_mask_1=None, attention_mask_2=None,
                 token_type_ids_1=None, token_type_ids_2=None,
                 deterministic: bool = True):
        # masks/token types accepted (the two-tower dataset emits them;
        # the reference TextCNN consumes input ids only, text.py:1496-1609)
        del attention_mask_1, attention_mask_2
        del token_type_ids_1, token_type_ids_2
        cfg = self.config
        tower = TextCNN(cfg, name="textcnn")
        f1 = tower(input_ids_1, deterministic)
        f2 = tower(input_ids_2, deterministic)
        if cfg.classification_method == "vec_sim":
            src_embeds, tgt_embeds, logits, probs = VecSimClassificationHead(
                cfg, name="classifier")(f1, f2, deterministic)
        else:
            src_embeds, tgt_embeds, logits, full_probs = TwoTowerClassificationHead(
                dropout_rate=cfg.hidden_dropout_prob, num_labels=cfg.num_labels,
                name="classifier")(f1, f2, deterministic)
            # reference quirk (text.py:1591-1594): embeds <- prob columns
            src_embeds = full_probs[:, 0]
            tgt_embeds = full_probs[:, 1]
            probs = full_probs[:, 1]
        loss = None
        if labels is not None:
            loss = pair_loss(cfg.loss_type, logits, probs, labels,
                             src_embeds, tgt_embeds, cfg.loss_margin, cfg.num_labels)
        return PairClassifierOutput(loss=loss, logits=logits, probs=probs,
                                    src_embeds=src_embeds, tgt_embeds=tgt_embeds)
