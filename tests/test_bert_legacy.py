"""Legacy 5-field BERT pipeline: align model, sim-eval weight export,
adversarial updates, structure-aware masking."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from item_alignment_tpu.config import ModelConfig
from item_alignment_tpu.data import bert_data as BD
from item_alignment_tpu.engine.adversarial import (
    free_update,
    make_adversarial_step,
    pgd_update,
)
from item_alignment_tpu.models.bert_legacy import (
    BertAlignModel,
    BertForPretraining,
    FIELD_NAMES,
    sim_eval_weight,
)

RNG = jax.random.PRNGKey(0)

TINY = dict(hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
            intermediate_size=64, vocab_size=120, max_position_embeddings=600)


class FakeTok:
    """Minimal char tokenizer for masking-logic tests."""

    cls_token_id, sep_token_id, pad_token_id = 101, 102, 0
    mask_token_id = 103

    def __len__(self):
        return 120

    def tokenize(self, s):
        return list(s)

    def convert_tokens_to_ids(self, toks):
        if isinstance(toks, str):
            return 103 if toks == "[MASK]" else (ord(toks[0]) % 110) + 5
        return [(ord(t[0]) % 110) + 5 if t != "[MASK]" else 103 for t in toks]


def _fields(batch=2):
    fields = {}
    rs = np.random.RandomState(0)
    for i, name in enumerate(FIELD_NAMES):
        L = 8 + 2 * i
        fields[name] = {
            "input_ids": jnp.array(rs.randint(3, 100, (batch, L)), jnp.int32),
            "attention_mask": jnp.ones((batch, L), jnp.int32),
            "token_type_ids": jnp.zeros((batch, L), jnp.int32),
        }
    return fields


def test_bert_align_model_forward_and_loss():
    cfg = ModelConfig(model_name="bert_legacy", **TINY)
    model = BertAlignModel(cfg)
    fields = _fields()
    labels = jnp.array([0, 1])
    params = jax.jit(model.init)({"params": RNG}, fields, labels=labels)
    out = jax.jit(model.apply)(params, fields, labels=labels)
    assert np.isfinite(float(out.loss))
    assert out.logits.shape == (2, 2)


def test_sim_eval_weight_reproduces_logit_margin():
    cfg = ModelConfig(model_name="bert_legacy", **TINY)
    model = BertAlignModel(cfg)
    fields = _fields()
    params = jax.jit(model.init)({"params": RNG}, fields)
    out = jax.jit(model.apply)(params, fields)
    w, b = sim_eval_weight(params)
    margin = np.asarray(out.src_embeds) @ np.asarray(w) + float(b)
    expected = np.asarray(out.logits[:, 1] - out.logits[:, 0])
    np.testing.assert_allclose(margin, expected, rtol=1e-4, atol=1e-5)


def test_noise_changes_output():
    cfg = ModelConfig(model_name="bert_legacy", **TINY)
    model = BertAlignModel(cfg)
    fields = _fields()
    params = jax.jit(model.init)({"params": RNG}, fields)
    base = jax.jit(model.apply)(params, fields)
    B, L = fields["pvs"]["input_ids"].shape
    # NB constant noise would be cancelled by the embedding LayerNorm
    noise = jax.random.normal(RNG, (B, L, cfg.hidden_size)) * 0.5
    noisy = jax.jit(model.apply)(params, fields, pvs_noise=noise)
    assert not np.allclose(np.asarray(base.logits), np.asarray(noisy.logits))


def test_free_and_pgd_updates_clamped():
    delta = jnp.zeros((2, 4))
    grad = jnp.array([[5.0, -3.0, 0.1, 0.0]] * 2)
    d1 = free_update(delta, grad, 0.01)
    assert float(jnp.max(jnp.abs(d1))) <= 0.01 + 1e-9
    assert float(d1[0, 0]) == pytest.approx(0.01)
    assert float(d1[0, 1]) == pytest.approx(-0.01)
    d2 = pgd_update(jax.random.PRNGKey(0), delta, grad, 0.02, 0.01)
    assert float(jnp.max(jnp.abs(d2))) <= 0.02 + 1e-9


def test_adversarial_step_runs():
    import optax
    cfg = ModelConfig(model_name="bert_legacy", **TINY)
    model = BertAlignModel(cfg)
    fields = _fields()
    labels = jnp.array([0, 1])
    params = jax.jit(model.init)({"params": RNG}, fields, labels=labels)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def loss_fn(p, deltas, batch):
        return model.apply(p, batch["fields"], labels=batch["labels"],
                           pvs_noise=deltas["pvs"],
                           title_noise=deltas["title"]).loss

    step = make_adversarial_step(loss_fn, tx, mode="FREE", epsilon=1e-2)
    B = 2
    deltas = {
        "pvs": jnp.zeros((B, fields["pvs"]["input_ids"].shape[1], cfg.hidden_size)),
        "title": jnp.zeros((B, fields["title"]["input_ids"].shape[1], cfg.hidden_size)),
    }
    batch = {"fields": fields, "labels": labels}
    params, opt_state, deltas, loss = step(params, opt_state, deltas, RNG, batch)
    assert np.isfinite(float(loss))
    # FREE updated deltas to the epsilon shell where grad is nonzero
    assert float(jnp.max(jnp.abs(deltas["pvs"]))) <= 1e-2 + 1e-9
    assert float(jnp.sum(jnp.abs(deltas["pvs"]))) > 0


def test_bert_pretraining_mlm_nsp():
    cfg = ModelConfig(model_name="bert_legacy", **TINY)
    model = BertForPretraining(cfg)
    B, S = 2, 16
    ids = jnp.array(np.random.RandomState(0).randint(3, 100, (B, S)), jnp.int32)
    mlm_labels = jnp.full((B, S), -1, jnp.int32)
    mlm_labels = mlm_labels.at[:, 3].set(7)
    nsp = jnp.array([1, 0])
    params = jax.jit(model.init)({"params": RNG}, ids, mlm_labels=mlm_labels,
                                 next_label=nsp)
    out = jax.jit(model.apply)(params, ids, mlm_labels=mlm_labels,
                               next_label=nsp)
    assert np.isfinite(float(out["loss"]))
    assert out["mlm_logits"].shape == (B, S, cfg.vocab_size)


# ----------------------------------------------------- masking semantics
def test_split_pv_tokens_and_title_match():
    pv_tokens = list("品牌:acme;颜色:红;")
    props = BD.split_pv_tokens(pv_tokens)
    assert [("".join(k), "".join(v)) for k, v in props] == \
        [("品牌", "acme"), ("颜色", "红")]
    title = list("acme红色咖啡机")
    spans = BD.title_value_match_spans(title, props)
    assert (0, 4) in spans     # "acme"
    assert (4, 5) in spans     # "红"


def test_whole_field_mask_distribution():
    rng = random.Random(0)
    ids = list(range(10, 20))
    kinds = {"keep": 0, "rand": 0, "mask": 0}
    for _ in range(300):
        out, labels = BD.whole_field_mask(ids, 103, 120, rng)
        assert labels == ids
        if out == ids:
            kinds["keep"] += 1
        elif all(t == 103 for t in out):
            kinds["mask"] += 1
        else:
            kinds["rand"] += 1
    assert kinds["keep"] > 200 and kinds["mask"] > 10 and kinds["rand"] > 10


def test_build_pretrain_examples():
    tok = FakeTok()
    items = [
        {"industry_name": "ind", "cate_name": "coffee", "cate_name_path": "a/b",
         "title": "acme红咖啡机", "item_pvs": "品牌:acme;颜色:红;"},
        {"industry_name": "ind2", "cate_name": "watch", "cate_name_path": "c/d",
         "title": "tic手表", "item_pvs": "品牌:tic;"},
    ]
    examples = BD.build_pretrain_examples(items[0], tok, max_seq_len=48,
                                          all_items=items,
                                          rng=random.Random(1), n_negatives=2)
    # industry + cate + title + 4 pv spans + 2 negatives
    assert len(examples) >= 7
    for ex in examples:
        assert len(ex["input_ids"]) == 50
        assert len(ex["label_ids"]) == 50
        assert ex["next_label"] in (0, 1)
    assert sum(1 for ex in examples if ex["next_label"] == 0) == 2
    # at least one example carries MLM supervision
    assert any(any(l >= 0 for l in ex["label_ids"]) for ex in examples)
