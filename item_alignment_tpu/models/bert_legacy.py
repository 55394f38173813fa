"""Legacy 5-field BERT pipeline (the reference's second text baseline,
ensemble member ``bert_base`` F1 0.8510).

Re-designs of reference ``src/bert/model.py`` / ``bert_pretrain.py``:

- ``BertAlignModel``    <- model.py:160-217: five shared-weight encoder
  passes over (pvs, title, cate, cate_path, industry_name) sentence pairs,
  pooled outputs SUMMED, 2-class NSP-style head; supports additive embedding
  noise on the pvs/title passes for adversarial training
  (finetune_bert.py:425-512)
- ``sim_eval_weight``   <- model.py:170-174: export (w[1]-w[0], b[1]-b[0])
  so inference reduces to a dot product (pred_bert.py)
- ``BertForPretraining``<- MLM + NSP heads for the domain-adaptive pretrain
  (bert_pretrain.py), MLM decoder weight-tied to the word embeddings.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from item_alignment_tpu.config import ModelConfig
from item_alignment_tpu.models.embeddings import EmbedPostprocess, create_position_ids
from item_alignment_tpu.models.encoder import ACT, Pooler, TransformerEncoder
from item_alignment_tpu.models.losses import cross_entropy_loss
from item_alignment_tpu.models.outputs import PairClassifierOutput

FIELD_NAMES = ("pvs", "title", "cate", "cate_path", "industry_name")
# field-specific pair max lengths (src/bert/data_utils.py:92-94)
FIELD_MAX_LENS = {"pvs": 512, "title": 150, "cate": 20, "cate_path": 50,
                  "industry_name": 20}


class NoisyBertBackbone(nn.Module):
    """Embeddings (+ optional additive embedding noise) + encoder + pooler.

    The noise hook mirrors the reference's FGSM-style deltas injected into
    the embedding output (src/bert/model.py BertEmbeddings ``noise`` arg).
    """

    config: ModelConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 noise: Optional[jax.Array] = None, deterministic: bool = True):
        cfg = self.config
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        position_ids = create_position_ids(input_ids, cfg.pad_token_id)
        we = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="word_embeddings",
                      embedding_init=nn.initializers.normal(cfg.initializer_range))
        embeds = we(input_ids)
        if noise is not None:
            embeds = embeds + noise[:, :embeds.shape[1], :]
        hidden = EmbedPostprocess(cfg, name="post")(
            embeds, token_type_ids, position_ids, deterministic)
        if cfg.dtype == "bfloat16":
            hidden = hidden.astype(jnp.bfloat16)
        states = TransformerEncoder(cfg, name="encoder")(
            hidden, attention_mask, deterministic)
        pooled = Pooler(cfg, name="pooler")(states[-1].astype(jnp.float32))
        return states[-1].astype(jnp.float32), pooled


class BertAlignModel(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(self, fields: Dict[str, Dict[str, jax.Array]],
                 labels: Optional[jax.Array] = None,
                 pvs_noise: Optional[jax.Array] = None,
                 title_noise: Optional[jax.Array] = None,
                 deterministic: bool = True):
        """``fields`` maps each of FIELD_NAMES to
        {input_ids, attention_mask, token_type_ids} of that field pair."""
        cfg = self.config
        backbone = NoisyBertBackbone(cfg, name="bert")
        noise = {"pvs": pvs_noise, "title": title_noise}
        pooled_sum = None
        for name in FIELD_NAMES:
            f = fields[name]
            _, pooled = backbone(f["input_ids"], f.get("attention_mask"),
                                 f.get("token_type_ids"),
                                 noise=noise.get(name),
                                 deterministic=deterministic)
            pooled_sum = pooled if pooled_sum is None else pooled_sum + pooled
        logits = nn.Dense(2, name="seq_relationship")(pooled_sum)
        probs = jax.nn.softmax(logits, axis=-1)[:, 1]
        loss = None
        if labels is not None:
            loss = cross_entropy_loss(logits, labels)
        return PairClassifierOutput(loss=loss, logits=logits, probs=probs,
                                    src_embeds=pooled_sum, tgt_embeds=pooled_sum)


def sim_eval_weight(params) -> Tuple[jax.Array, jax.Array]:
    """(w[1]-w[0], b[1]-b[0]) of the NSP head: score(x) = x.w + b equals the
    class-1-minus-class-0 logit margin (model.py:170-174)."""
    head = params["params"]["seq_relationship"]
    w = head["kernel"]  # [H, 2]
    b = head["bias"]
    return w[:, 1] - w[:, 0], b[1] - b[0]


class BertForPretraining(nn.Module):
    """MLM + NSP for the structure-aware domain pretrain.

    MLM label convention: -1 (or -100) = not predicted, else the original
    token id (bert_pretrain.py label_ids).
    """

    config: ModelConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 mlm_labels: Optional[jax.Array] = None,
                 next_label: Optional[jax.Array] = None,
                 deterministic: bool = True):
        cfg = self.config
        backbone = NoisyBertBackbone(cfg, name="bert")
        sequence_output, pooled = backbone(
            input_ids, attention_mask, token_type_ids,
            deterministic=deterministic)

        # MLM transform head: dense + act + LN, decoder tied to word emb
        x = nn.Dense(cfg.hidden_size, name="transform_dense")(sequence_output)
        x = ACT[cfg.hidden_act](x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="transform_ln")(x)
        word_emb = self.variables["params"]["bert"]["word_embeddings"]["embedding"]
        mlm_bias = self.param("mlm_bias", nn.initializers.zeros,
                              (cfg.vocab_size,))
        mlm_logits = x @ word_emb.T + mlm_bias

        nsp_logits = nn.Dense(2, name="seq_relationship")(pooled)

        loss = None
        if mlm_labels is not None:
            valid = (mlm_labels >= 0).astype(jnp.float32)
            safe_labels = jnp.maximum(mlm_labels, 0)
            logp = jax.nn.log_softmax(mlm_logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(
                logp, safe_labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
            mlm_loss = jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)
            loss = mlm_loss
            if next_label is not None:
                loss = loss + cross_entropy_loss(nsp_logits, next_label)
        return {"mlm_logits": mlm_logits, "nsp_logits": nsp_logits,
                "loss": loss}
