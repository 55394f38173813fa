"""Checkpoint-import parity: a torch BERT encoder's outputs must match our
Flax encoder to ~1e-4 after weight conversion (the BASELINE.json logit-parity
harness, run on a tiny random-initialized model)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from item_alignment_tpu.config import ModelConfig
from item_alignment_tpu.models.text import RobertaBackbone
from item_alignment_tpu.utils.hf_import import (
    convert_encoder_state_dict,
    convert_pkgm_state_dicts,
    import_hf_roberta,
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def torch_bert():
    from transformers import BertConfig, BertModel

    cfg = BertConfig(vocab_size=200, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=64, type_vocab_size=2,
                     hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    model = BertModel(cfg, add_pooling_layer=False)
    model.eval()
    return model, cfg


def test_encoder_parity_after_conversion(torch_bert):
    model, tcfg = torch_bert
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    cfg = ModelConfig(vocab_size=200, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=64,
                      max_position_embeddings=64, type_vocab_size=2,
                      hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                      use_flash_attention=False)
    backbone = RobertaBackbone(cfg)

    rs = np.random.RandomState(0)
    ids = rs.randint(1, 200, (2, 10)).astype(np.int32)
    mask = np.ones((2, 10), np.int32)
    tt = np.zeros((2, 10), np.int32)
    pos = np.tile(np.arange(10), (2, 1)).astype(np.int32)  # match HF arange

    params = jax.jit(backbone.init)(
        {"params": jax.random.PRNGKey(0)}, jnp.array(ids), jnp.array(mask),
        jnp.array(tt), jnp.array(pos))
    converted = convert_encoder_state_dict(sd)
    tree = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    # overlay converted weights
    from item_alignment_tpu.utils.hf_import import _overlay
    _overlay(tree["params"]["embeddings"], converted["embeddings"])
    _overlay(tree["params"]["encoder"], converted["encoder"])

    ours = np.asarray(jax.jit(backbone.apply)(
        tree, jnp.array(ids), jnp.array(mask), jnp.array(tt),
        jnp.array(pos))[-1])

    with torch.no_grad():
        theirs = model(input_ids=torch.tensor(ids, dtype=torch.long),
                       attention_mask=torch.tensor(mask, dtype=torch.long),
                       token_type_ids=torch.tensor(tt, dtype=torch.long),
                       position_ids=torch.tensor(pos, dtype=torch.long)
                       ).last_hidden_state.numpy()
    diff = np.abs(ours - theirs).max()
    assert diff < 1e-4, f"max abs diff {diff}"


def test_row_copy_quirks(torch_bert):
    model, _ = torch_bert
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    converted = convert_encoder_state_dict(sd, type_vocab_size=4,
                                           max_position_embeddings=600)
    tte = converted["embeddings"]["post"]["token_type_embeddings"]["embedding"]
    pe = converted["embeddings"]["post"]["position_embeddings"]["embedding"]
    assert tte.shape[0] == 4 and pe.shape[0] == 600
    np.testing.assert_array_equal(
        tte[:2], sd["embeddings.token_type_embeddings.weight"])
    np.testing.assert_array_equal(
        pe[:64], sd["embeddings.position_embeddings.weight"])
    # grown rows initialized, not zero
    assert np.abs(tte[2:]).sum() > 0


def test_pkgm_merge(torch_bert):
    model, _ = torch_bert
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    rs = np.random.RandomState(1)
    kg_sd = {"ent_emb.weight": rs.randn(50, 32).astype(np.float32),
             "rel_emb.weight": rs.randn(10, 32).astype(np.float32),
             "proj_mat.weight": rs.randn(32, 32).astype(np.float32)}
    tree = convert_pkgm_state_dicts(sd, kg_sd)
    assert tree["embeddings"]["ent_emb"]["embedding"].shape == (50, 32)
    np.testing.assert_array_equal(tree["embeddings"]["proj_mat"]["kernel"],
                                  kg_sd["proj_mat.weight"].T)


def test_import_hf_roberta_end_to_end(torch_bert):
    from item_alignment_tpu.models.text import RobertaOneTower

    model, _ = torch_bert
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = ModelConfig(vocab_size=200, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=64,
                      max_position_embeddings=64, type_vocab_size=4,
                      max_seq_len=4, max_seq_len_pv=4)
    m = RobertaOneTower(cfg)
    ids = jnp.ones((1, cfg.pair_seq_len), jnp.int32)
    params = jax.jit(m.init)({"params": jax.random.PRNGKey(0)}, ids)
    params = jax.tree_util.tree_map(np.asarray, params)
    merged = import_hf_roberta(params, sd, cfg)
    word = merged["params"]["roberta"]["embeddings"]["word_embeddings"]["embedding"]
    np.testing.assert_array_equal(word, sd["embeddings.word_embeddings.weight"])
    out = jax.jit(m.apply)(merged, ids)
    assert np.isfinite(np.asarray(out.probs)).all()
