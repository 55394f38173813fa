"""Multi-chip breadth (VERDICT r2 #4): every model family takes one real
sharded train step on the forced 8-device CPU mesh, tp=2 logits equal tp=1,
and a sharded full-train-state checkpoint round-trips under a 2,2,2 mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from item_alignment_tpu.config import (
    MeshConfig, ModelConfig, OptimizerConfig, TrainConfig,
)
from item_alignment_tpu.engine.train import Trainer
from item_alignment_tpu.parallel.mesh import create_mesh

RNG = jax.random.PRNGKey(0)


def _mesh(data=2, fsdp=2, tensor=2):
    return create_mesh(MeshConfig(data=data, fsdp=fsdp, tensor=tensor))


def _tcfg(bs, data=2, fsdp=2, tensor=2):
    return TrainConfig(train_batch_size=bs, eval_batch_size=bs, num_epochs=1,
                       mesh=MeshConfig(data=data, fsdp=fsdp, tensor=tensor),
                       optimizer=OptimizerConfig(learning_rate=1e-3,
                                                 total_steps=8))


def _one_step(model, tcfg, batch, mesh=None):
    trainer = Trainer(model, tcfg, mesh=mesh)
    trainer.setup(batch)
    state, loss = trainer._train_step(trainer.state,
                                      trainer._device_batch(batch))
    trainer.state = state
    assert np.isfinite(float(loss)), float(loss)
    return trainer, float(loss)


def test_nfnet_family_sharded_step():
    import item_alignment_tpu.models.image as im
    from item_alignment_tpu.models.image import ImageTwoTower, NFNet

    cfg = ModelConfig(model_name="eca_nfnet_l0",
                      image_model_name="eca_nfnet_l0", image_size=32,
                      hidden_dropout_prob=0.0)
    orig = dict(im.BACKBONES)
    im.BACKBONES["nfnet"] = lambda c: NFNet(depths=(1,), channels=(16,))
    try:
        batch = {
            "images_1": np.ones((8, 32, 32, 3), np.float32),
            "images_2": np.ones((8, 32, 32, 3), np.float32),
            "labels": (np.arange(8) % 2).astype(np.int32),
        }
        _one_step(ImageTwoTower(cfg), _tcfg(8), batch, _mesh())
    finally:
        im.BACKBONES.update(orig)


def test_coca_family_sharded_step():
    from item_alignment_tpu.models.multimodal import CoCaForItemAlignment

    cfg = ModelConfig(model_name="coca", ensemble="sum", hidden_size=32,
                      num_hidden_layers=1, num_attention_heads=4,
                      intermediate_size=64, vocab_size=100,
                      max_position_embeddings=128, image_hidden_size=24,
                      multimodal_depth=1, coca_heads=4, ff_mult=2,
                      image_size=16, patch_size=8, hidden_dropout_prob=0.0)
    rs = np.random.RandomState(0)
    B, S = 8, 10
    batch = {
        "input_ids_1": rs.randint(3, 90, (B, S)).astype(np.int32),
        "images_1": np.ones((B, 16, 16, 3), np.float32),
        "input_ids_2": rs.randint(3, 90, (B, S)).astype(np.int32),
        "images_2": np.ones((B, 16, 16, 3), np.float32),
        "labels": (np.arange(B) % 2).astype(np.int32),
    }
    _one_step(CoCaForItemAlignment(cfg), _tcfg(8), batch, _mesh())


def test_kge_family_sharded_epoch_matches_unsharded():
    """KGETrainer with a data-sharded triple batch: one epoch on an 8-way
    data mesh must reproduce the unsharded loss (embedding-grad psum)."""
    from item_alignment_tpu.kge import KGETrainer, make_kge_model
    from item_alignment_tpu.kge.graph import KnowledgeGraph

    rs = np.random.RandomState(0)
    n_ent, n_rel, n_facts = 50, 5, 160
    heads = rs.randint(0, n_ent, n_facts)
    tails = rs.randint(0, n_ent, n_facts)
    rels = rs.randint(0, n_rel, n_facts)
    kg = KnowledgeGraph(heads, rels, tails, n_ent, n_rel)
    kw = dict(margin=1.0, n_neg=2, batch_size=16, n_epochs=1,
              learning_rate=1e-2, seed=3)

    model = make_kge_model("pkgm", n_ent, n_rel, 16)
    sharded = KGETrainer(model, kg, mesh=_mesh(data=8, fsdp=1, tensor=1),
                         **kw)
    plain = KGETrainer(model, kg, **kw)
    hs = sharded.run()["history"][0]["loss"]
    hp = plain.run()["history"][0]["loss"]
    assert np.isfinite(hs)
    np.testing.assert_allclose(hs, hp, rtol=1e-4)


def test_gcn_family_sharded_step_matches_unsharded():
    """GCNTwoTower with the pair batch sharded over the data axis: the
    spmm runs on replicated graph state; loss and grads must match the
    single-device step (segment-sum + psum correctness)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from item_alignment_tpu.models.graph import GCNTwoTower
    from item_alignment_tpu.ops.sparse import normalize_adjacency

    rs = np.random.RandomState(0)
    n, f, e = 24, 8, 60
    feats = jnp.asarray(rs.randn(n, f), jnp.float32)
    src = rs.randint(0, n, e)
    dst = rs.randint(0, n, e)
    ei, ew = normalize_adjacency(np.stack([src, dst]), n)
    ei, ew = jnp.asarray(ei), jnp.asarray(ew)
    cfg = ModelConfig(model_name="gcn", gcn_hidden=16, gcn_layers=2,
                      gcn_feature_dim=f, hidden_dropout_prob=0.0)
    model = GCNTwoTower(cfg)
    B = 8
    s_idx = jnp.asarray(rs.randint(0, n, B), jnp.int32)
    t_idx = jnp.asarray(rs.randint(0, n, B), jnp.int32)
    labels = jnp.asarray(np.arange(B) % 2, jnp.int32)
    params = model.init({"params": RNG}, feats, ei, ew, s_idx, t_idx,
                        labels=labels)

    def loss_fn(p, s, t, l):
        return model.apply(p, feats, ei, ew, s, t, labels=l).loss

    g_plain = jax.value_and_grad(loss_fn)(params, s_idx, t_idx, labels)

    mesh = _mesh(data=8, fsdp=1, tensor=1)
    data_sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    p_sh = jax.device_put(params, rep)
    loss_s, grads_s = jax.jit(jax.value_and_grad(loss_fn))(
        p_sh, jax.device_put(s_idx, data_sh), jax.device_put(t_idx, data_sh),
        jax.device_put(labels, data_sh))
    np.testing.assert_allclose(float(loss_s), float(g_plain[0]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(grads_s),
                    jax.tree_util.tree_leaves(g_plain[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_flagship_tp2_matches_tp1_logits():
    """Tensor-parallel partition rules must be numerics-preserving: the
    flagship eval probs under tensor=2 equal the tensor=1 result."""
    from item_alignment_tpu.models.text import RobertaOneTower

    cfg = ModelConfig(hidden_size=64, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=128,
                      vocab_size=120, max_seq_len=8, max_seq_len_pv=8,
                      max_position_embeddings=64, hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    model = RobertaOneTower(cfg)
    rs = np.random.RandomState(1)
    B, S = 8, cfg.pair_seq_len
    batch = {
        "input_ids": rs.randint(1, 120, (B, S)).astype(np.int32),
        "attention_mask": np.ones((B, S), np.int32),
        "labels": (np.arange(B) % 2).astype(np.int32),
    }

    probs = {}
    for tensor in (1, 2):
        tcfg = _tcfg(B, data=2, fsdp=2 // tensor, tensor=tensor)
        trainer = Trainer(model, tcfg,
                          mesh=_mesh(2, 2 // tensor, tensor))
        # identical params across runs: seed is fixed in TrainConfig
        trainer.setup(batch)
        ev = {k: v for k, v in batch.items() if k != "labels"}
        p, _, _ = trainer._eval_step(trainer.state.params,
                                     trainer._device_batch(ev))
        probs[tensor] = np.asarray(p)
    np.testing.assert_allclose(probs[2], probs[1], rtol=2e-5, atol=2e-6)


def test_flagship_int8_eval_on_sharded_mesh():
    """The int8 serving path (ops/quant.py) must survive GSPMD: with the
    dense kernels tensor-sharded, the per-channel weight scales are local
    to each shard's output columns and the per-token activation amax spans
    the full feature axis (XLA inserts the collective); tp=2 int8 probs
    must match the tp=1 int8 result."""
    from item_alignment_tpu.models.text import RobertaOneTower

    cfg = ModelConfig(hidden_size=64, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=128,
                      vocab_size=120, max_seq_len=8, max_seq_len_pv=8,
                      max_position_embeddings=64, hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0, quant="int8")
    model = RobertaOneTower(cfg)
    rs = np.random.RandomState(3)
    B, S = 8, cfg.pair_seq_len
    batch = {
        "input_ids": rs.randint(1, 120, (B, S)).astype(np.int32),
        "attention_mask": np.ones((B, S), np.int32),
        "labels": (np.arange(B) % 2).astype(np.int32),
    }
    probs = {}
    for tensor in (1, 2):
        tcfg = _tcfg(B, data=2, fsdp=2 // tensor, tensor=tensor)
        trainer = Trainer(model, tcfg, mesh=_mesh(2, 2 // tensor, tensor))
        trainer.setup(batch)
        ev = {k: v for k, v in batch.items() if k != "labels"}
        p, _, _ = trainer._eval_step(trainer.state.params,
                                     trainer._device_batch(ev))
        probs[tensor] = np.asarray(p)
    assert np.isfinite(probs[1]).all()
    np.testing.assert_allclose(probs[2], probs[1], rtol=2e-5, atol=2e-6)


def test_sharded_checkpoint_roundtrip_222(tmp_path):
    """Full train-state save -> restore -> resume under a 2,2,2 mesh: the
    restored state reproduces the uninterrupted trajectory."""
    from item_alignment_tpu.engine.checkpoint import CheckpointManager
    from item_alignment_tpu.models.text import RobertaOneTower

    cfg = ModelConfig(hidden_size=64, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=128,
                      vocab_size=120, max_seq_len=8, max_seq_len_pv=8,
                      max_position_embeddings=64, hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    rs = np.random.RandomState(2)
    B, S = 8, cfg.pair_seq_len
    batch = {
        "input_ids": rs.randint(1, 120, (B, S)).astype(np.int32),
        "attention_mask": np.ones((B, S), np.int32),
        "labels": (np.arange(B) % 2).astype(np.int32),
    }
    tcfg = _tcfg(B)

    t1 = Trainer(RobertaOneTower(cfg), tcfg, mesh=_mesh())
    t1.setup(batch)
    dev_batch = t1._device_batch(batch)
    for _ in range(2):
        t1.state, _ = t1._train_step(t1.state, dev_batch)
    manager = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    t1.save_checkpoint(manager, epoch=0, best_f1=0.5)
    # uninterrupted continuation
    t1.state, loss_cont = t1._train_step(t1.state, dev_batch)

    t2 = Trainer(RobertaOneTower(cfg), tcfg, mesh=_mesh())
    t2.setup(batch)
    meta = t2.restore_checkpoint(manager)
    assert meta["epoch"] == 0 and abs(meta["best_f1"] - 0.5) < 1e-9
    t2.state, loss_resumed = t2._train_step(t2.state, t2._device_batch(batch))
    np.testing.assert_allclose(float(loss_resumed), float(loss_cont),
                               rtol=1e-6)
