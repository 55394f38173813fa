"""Forward/backward sanity of the text model zoo under jit."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from item_alignment_tpu.config import ModelConfig
from item_alignment_tpu.models.text import (
    PKGMOneTower,
    PKGMTwoTower,
    RobertaOneTower,
    RobertaTwoTower,
    TextCNNTwoTower,
)

RNG = jax.random.PRNGKey(0)

TINY = dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, vocab_size=100, max_position_embeddings=128)


def _roberta_inputs(cfg, batch=2):
    S = cfg.pair_seq_len
    ids = jax.random.randint(RNG, (batch, S), 1, cfg.vocab_size)
    mask = jnp.ones((batch, S), jnp.int32)
    labels = jnp.arange(batch) % 2
    return ids, mask, labels


@pytest.mark.parametrize("classification_method,loss_type", [
    ("cls", "ce"), ("vec_sim", "cosine"), ("vec_sim", "bce"),
    ("cls", "ce"), ("vec_sim", "hinge"),
])
def test_roberta_one_tower_variants(classification_method, loss_type):
    sm = {"cosine": "cosine", "bce": "inner_product", "hinge": "l2"}.get(loss_type, "softmax")
    cfg = ModelConfig(max_seq_len=8, max_seq_len_pv=8,
                      classification_method=classification_method,
                      similarity_measure=sm, loss_type=loss_type,
                      loss_margin=0.5, **TINY)
    model = RobertaOneTower(cfg)
    ids, mask, labels = _roberta_inputs(cfg)
    params = model.init({"params": RNG}, ids, mask, labels=labels)
    out = jax.jit(lambda p, i, m, l: model.apply(p, i, m, labels=l))(params, ids, mask, labels)
    assert np.isfinite(float(out.loss))
    assert out.probs.shape == (2,)
    assert ((np.asarray(out.probs) >= 0) & (np.asarray(out.probs) <= 1)).all()


def test_roberta_one_tower_cls_layers_cat_and_avg():
    for pool, layers in (("cat", (1, 2, 3, 4)), ("avg", (1, 2))):
        cfg = ModelConfig(max_seq_len=8, max_seq_len_pv=8, cls_layers=layers,
                          cls_pool=pool, **{**TINY, "num_hidden_layers": 4})
        model = RobertaOneTower(cfg)
        ids, mask, labels = _roberta_inputs(cfg)
        params = model.init({"params": RNG}, ids, mask, labels=labels)
        out = model.apply(params, ids, mask, labels=labels)
        assert np.isfinite(float(out.loss))


def test_roberta_one_tower_grads_finite():
    cfg = ModelConfig(max_seq_len=8, max_seq_len_pv=8, **TINY)
    model = RobertaOneTower(cfg)
    ids, mask, labels = _roberta_inputs(cfg)
    params = model.init({"params": RNG}, ids, mask, labels=labels)

    def loss_fn(p):
        return model.apply(p, ids, mask, labels=labels).loss

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(np.abs(np.asarray(g)).sum() > 0 for g in leaves)


def test_roberta_one_tower_auxiliary_task():
    cfg = ModelConfig(max_seq_len=8, max_seq_len_pv=8, auxiliary_task=True,
                      max_pair_indices=4, **TINY)
    model = RobertaOneTower(cfg)
    ids, mask, labels = _roberta_inputs(cfg)
    spans = jnp.full((2, 4, 5), -1, jnp.int32)
    spans = spans.at[0, 0].set(jnp.array([1, 3, 17, 20, 1]))
    params = model.init({"params": RNG}, ids, mask, labels=labels, pair_spans=spans)
    with_aux = model.apply(params, ids, mask, labels=labels, pair_spans=spans)
    no_aux = model.apply(params, ids, mask, labels=labels,
                         pair_spans=jnp.full((2, 4, 5), -1, jnp.int32))
    assert float(with_aux.loss) != float(no_aux.loss)


def test_roberta_two_tower():
    cfg = ModelConfig(max_seq_len=8, max_seq_len_pv=8,
                      interaction_type="two_tower", **TINY)
    model = RobertaTwoTower(cfg)
    ids = jax.random.randint(RNG, (2, 16), 1, cfg.vocab_size)
    mask = jnp.ones_like(ids)
    labels = jnp.array([0, 1])
    params = model.init({"params": RNG}, ids, ids, mask, mask, labels=labels)
    out = model.apply(params, ids, ids, mask, mask, labels=labels)
    assert out.logits.shape == (2, 2)
    assert np.isfinite(float(out.loss))
    # identical towers + shared weights -> symmetric embeds
    np.testing.assert_allclose(np.asarray(out.src_embeds), np.asarray(out.tgt_embeds))


def _pkgm_cfg(**kw):
    return ModelConfig(model_name="pkgm", max_seq_len=8, max_seq_len_pv=None,
                       max_pvs=3, num_entities=50, num_relations=10,
                       kg_embedding_dim=32, **TINY, **kw)


def _pkgm_one_tower_batch(cfg, batch=2):
    item_id_len = cfg.max_seq_len + cfg.max_pvs + 1   # text + entity + relations
    item_embed_len = cfg.max_seq_len + 2 * cfg.max_pvs
    ids = np.zeros((batch, 2 * item_id_len), np.int32)
    ids[:, :4] = [2, 5, 6, 3]
    ids[:, cfg.max_seq_len] = 7           # entity id
    ids[:, cfg.max_seq_len + 1] = 2       # relation ids
    ids[:, item_id_len: item_id_len + 4] = [2, 8, 9, 3]
    ids[:, item_id_len + cfg.max_seq_len] = 11
    mask = np.zeros((batch, 2 * item_embed_len), np.int32)
    mask[:, :6] = 1
    tt = np.zeros_like(mask)
    tt[:, item_embed_len:] = 1
    pos = np.tile(np.arange(2 * item_embed_len), (batch, 1))
    return jnp.array(ids), jnp.array(mask), jnp.array(tt), jnp.array(pos)


def test_pkgm_one_tower():
    cfg = _pkgm_cfg()
    model = PKGMOneTower(cfg)
    ids, mask, tt, pos = _pkgm_one_tower_batch(cfg)
    labels = jnp.array([0, 1])
    params = model.init({"params": RNG}, ids, mask, tt, pos, labels=labels)
    out = model.apply(params, ids, mask, tt, pos, labels=labels)
    assert np.isfinite(float(out.loss))
    # embedded length must be 2*(max_seq_len + 2*max_pvs)
    assert mask.shape[1] == 2 * (cfg.max_seq_len + 2 * cfg.max_pvs)


def test_pkgm_two_tower():
    cfg = _pkgm_cfg(interaction_type="two_tower")
    model = PKGMTwoTower(cfg)
    item_id_len = cfg.max_seq_len + cfg.max_pvs + 1
    item_embed_len = cfg.max_seq_len + 2 * cfg.max_pvs
    ids = jnp.array(np.random.RandomState(0).randint(1, 10, (2, item_id_len)))
    mask = jnp.ones((2, item_embed_len), jnp.int32)
    pos = jnp.tile(jnp.arange(item_embed_len), (2, 1))
    labels = jnp.array([1, 0])
    params = model.init({"params": RNG}, ids, ids, mask, mask,
                        position_ids=pos, labels=labels)
    out = model.apply(params, ids, ids, mask, mask, position_ids=pos, labels=labels)
    assert np.isfinite(float(out.loss))


def test_textcnn_two_tower_vec_sim_and_cls():
    for method in ("cls", "vec_sim"):
        cfg = ModelConfig.textcnn(
            classification_method=method, similarity_measure="cosine",
            loss_type="cosine" if method == "vec_sim" else "ce",
            num_filters=8, **TINY)
        model = TextCNNTwoTower(cfg)
        ids = jax.random.randint(RNG, (2, 16), 1, cfg.vocab_size)
        labels = jnp.array([0, 1])
        params = model.init({"params": RNG}, ids, ids, labels=labels)
        out = model.apply(params, ids, ids, labels=labels)
        assert np.isfinite(float(out.loss)), method


def test_cate_ids_hook():
    """cate_ids hook (reference text.py:1143/1237, base.py:274-276): a
    category embedding is added when cate_ids are passed and changes the
    output; omitting cate_ids works on the same module."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from item_alignment_tpu.config import ModelConfig
    from item_alignment_tpu.models.text import RobertaOneTower

    cfg = ModelConfig(model_name="tiny", hidden_size=32, num_hidden_layers=1,
                      num_attention_heads=4, intermediate_size=64,
                      vocab_size=60, max_position_embeddings=64,
                      max_seq_len=4, max_seq_len_pv=4, cate_size=7,
                      hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    model = RobertaOneTower(cfg)
    ids = jnp.asarray(np.random.RandomState(0).randint(1, 60, (2, 16)))
    cate = jnp.asarray([[2] * 16, [5] * 16])
    params = model.init(jax.random.PRNGKey(0), ids, cate_ids=cate)["params"]
    out_with = model.apply({"params": params}, ids, cate_ids=cate)
    out_wo = model.apply({"params": params}, ids)
    assert "cate_embeddings" in params["roberta"]["embeddings"]
    assert not np.allclose(np.asarray(out_with.logits),
                           np.asarray(out_wo.logits))


def test_fuse_qkv_matches_unfused():
    """cfg.fuse_qkv computes the q/k/v projections as one [H, 3H] matmul;
    the param tree is identical, so the same params must produce the same
    logits (and gradients must flow) either way."""
    import jax

    from item_alignment_tpu.config import ModelConfig
    from item_alignment_tpu.models.text import RobertaOneTower

    kw = dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
              intermediate_size=64, vocab_size=60, max_seq_len=8,
              max_seq_len_pv=8, max_position_embeddings=64,
              hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    base = RobertaOneTower(ModelConfig(**kw))
    fused = RobertaOneTower(ModelConfig(fuse_qkv=True, **kw))
    ids = jnp.asarray(np.random.RandomState(0).randint(3, 50, (2, 16)))
    mask = jnp.ones_like(ids)
    params = jax.jit(base.init)({"params": jax.random.PRNGKey(0)}, ids, mask)
    # identical tree: fused init produces the same structure
    pf = jax.jit(fused.init)({"params": jax.random.PRNGKey(0)}, ids, mask)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(pf))
    out_b = np.asarray(base.apply(params, ids, mask).logits)
    out_f = np.asarray(fused.apply(params, ids, mask).logits)
    np.testing.assert_allclose(out_f, out_b, atol=1e-5, rtol=1e-5)
    g = jax.grad(lambda p: float(0) + fused.apply(
        p, ids, mask, labels=jnp.asarray([0, 1])).loss)(params)
    q = g["params"]["roberta"]["encoder"]["layer_0"]["attention"]["query"]
    assert float(np.abs(np.asarray(q["kernel"])).max()) > 0
