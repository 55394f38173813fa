"""GCNII graph model: SpMM correctness, GCN2Conv parity vs torch_geometric
formula, end-to-end learning on a synthetic two-cluster graph."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from item_alignment_tpu.config import ModelConfig
from item_alignment_tpu.models.graph import GCN2Layer, GCNII, GCNTwoTower
from item_alignment_tpu.ops.sparse import normalize_adjacency, pad_edges, spmm

RNG = jax.random.PRNGKey(0)


def test_spmm_matches_dense():
    rs = np.random.RandomState(0)
    n = 6
    dense = (rs.rand(n, n) < 0.4).astype(np.float32) * rs.rand(n, n)
    src, dst = np.nonzero(dense)
    w = dense[src, dst].astype(np.float32)
    x = rs.randn(n, 4).astype(np.float32)
    # our convention: messages flow src->dst, out[dst] += w * x[src]
    ours = np.asarray(spmm(jnp.array(np.stack([src, dst])), jnp.array(w),
                           jnp.array(x), n))
    expected = dense.T @ x
    np.testing.assert_allclose(ours, expected, rtol=1e-5, atol=1e-6)


def test_spmm_chunked_matches_unchunked():
    """The lax.scan edge-chunked SpMM (reference-scale training path) must
    produce identical values AND gradients to the single-shot formulation."""
    rs = np.random.RandomState(1)
    n, e_raw = 12, 30
    src = rs.randint(0, n, e_raw)
    dst = rs.randint(0, n, e_raw)
    ei, ew = normalize_adjacency(np.stack([src, dst]), n)
    ei, ew = pad_edges(ei, ew, 48)  # divisible by chunk 16
    x = jnp.asarray(rs.randn(n, 8).astype(np.float32))
    eij, ewj = jnp.asarray(ei), jnp.asarray(ew)

    full = spmm(eij, ewj, x, n)
    chunked = spmm(eij, ewj, x, n, edge_chunk=16)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                               rtol=1e-6, atol=1e-7)

    g_full = jax.grad(lambda x: jnp.sum(spmm(eij, ewj, x, n) ** 2))(x)
    g_chunk = jax.grad(lambda x: jnp.sum(
        spmm(eij, ewj, x, n, edge_chunk=16) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_chunk),
                               rtol=1e-6, atol=1e-7)


def test_gcnii_edge_chunk_config_equivalence():
    cfg = ModelConfig(model_name="gcn", gcn_hidden=8, gcn_layers=2,
                      gcn_feature_dim=4, hidden_dropout_prob=0.0)
    cfg_c = cfg.replace(gcn_edge_chunk=8)
    rs = np.random.RandomState(2)
    n = 10
    ei, ew = normalize_adjacency(
        np.stack([rs.randint(0, n, 14), rs.randint(0, n, 14)]), n)
    ei, ew = pad_edges(ei, ew, 32)
    feats = jnp.asarray(rs.randn(n, 4).astype(np.float32))
    eij, ewj = jnp.asarray(ei), jnp.asarray(ew)
    params = GCNII(cfg).init({"params": RNG}, feats, eij, ewj)
    out = GCNII(cfg).apply(params, feats, eij, ewj)
    out_c = GCNII(cfg_c).apply(params, feats, eij, ewj)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_c),
                               rtol=1e-6, atol=1e-6)


def test_spmm_custom_vjp_matches_dense_autodiff():
    """spmm's custom VJP (bwd = spmm over swapped edges) must equal the
    gradient of the equivalent dense formulation, for both x and the edge
    weights."""
    rs = np.random.RandomState(4)
    n = 7
    dense = (rs.rand(n, n) < 0.5).astype(np.float32) * rs.rand(n, n)
    src, dst = np.nonzero(dense)
    w = jnp.asarray(dense[src, dst].astype(np.float32))
    ei = jnp.asarray(np.stack([src, dst]).astype(np.int32))
    x = jnp.asarray(rs.randn(n, 5).astype(np.float32))

    def loss_sparse(x_, w_):
        return jnp.sum(spmm(ei, w_, x_, n) ** 2)

    def loss_dense(x_, w_):
        a = jnp.zeros((n, n)).at[src, dst].set(w_)
        return jnp.sum((a.T @ x_) ** 2)

    gx_s, gw_s = jax.grad(loss_sparse, argnums=(0, 1))(x, w)
    gx_d, gw_d = jax.grad(loss_dense, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_d),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_d),
                               rtol=1e-5, atol=1e-6)


def test_spmm_sorted_transpose_matches_unsorted():
    """The TPU-scale path (dst-sorted edges + precomputed transpose list
    in the VJP, sorted padding) must give identical values and gradients
    to the plain unsorted formulation."""
    from item_alignment_tpu.ops.sparse import sort_edges_by_dst, transpose_edges

    rs = np.random.RandomState(5)
    n, e = 9, 20
    ei = np.stack([rs.randint(0, n, e), rs.randint(0, n, e)])
    ei, ew = normalize_adjacency(ei, n)
    x = jnp.asarray(rs.randn(n, 6).astype(np.float32))

    base = spmm(jnp.asarray(ei), jnp.asarray(ew), x, n)
    g_base = jax.grad(lambda x: jnp.sum(
        spmm(jnp.asarray(ei), jnp.asarray(ew), x, n) ** 2))(x)

    si, sw = sort_edges_by_dst(ei, ew)
    si, sw = pad_edges(si, sw, 32, pad_dst=n - 1)
    assert (np.diff(si[1]) >= 0).all()  # sorted after padding
    ti, tw = transpose_edges(ei, ew)
    ti, tw = pad_edges(ti, tw, 32, pad_dst=n - 1)
    args = (jnp.asarray(si), jnp.asarray(sw))
    trans = (jnp.asarray(ti), jnp.asarray(tw))

    out = spmm(*args, x, n, 8, True, trans)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=1e-6, atol=1e-7)
    g = jax.grad(lambda x: jnp.sum(spmm(*args, x, n, 8, True, trans) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_base),
                               rtol=1e-5, atol=1e-6)


def test_gcnii_scan_matches_unrolled():
    """The nn.scan layer stack (production path: one compiled layer body)
    must match the unrolled loop exactly given the same weights."""
    cfg_loop = ModelConfig(model_name="gcn", gcn_hidden=8, gcn_layers=3,
                           gcn_feature_dim=4, hidden_dropout_prob=0.0,
                           gcn_scan_layers=False)
    cfg_scan = cfg_loop.replace(gcn_scan_layers=True)
    rs = np.random.RandomState(3)
    n = 10
    ei, ew = normalize_adjacency(
        np.stack([rs.randint(0, n, 14), rs.randint(0, n, 14)]), n)
    feats = jnp.asarray(rs.randn(n, 4).astype(np.float32))
    eij, ewj = jnp.asarray(ei), jnp.asarray(ew)

    p_loop = GCNII(cfg_loop).init({"params": RNG}, feats, eij, ewj)
    # remap conv_i/weight/kernel -> conv/weight/kernel stacked on axis 0
    stacked = np.stack([
        np.asarray(p_loop["params"][f"conv_{i}"]["weight"]["kernel"])
        for i in range(cfg_loop.gcn_layers)])
    p_scan = {"params": {
        "linear": p_loop["params"]["linear"],
        "conv": {"weight": {"kernel": jnp.asarray(stacked)}},
    }}
    out_loop = GCNII(cfg_loop).apply(p_loop, feats, eij, ewj)
    out_scan = GCNII(cfg_scan).apply(p_scan, feats, eij, ewj)
    np.testing.assert_allclose(np.asarray(out_loop), np.asarray(out_scan),
                               rtol=1e-6, atol=1e-6)
    # gradients agree too (the scan is the reference-scale TRAIN path)
    g_loop = jax.grad(lambda f: jnp.sum(
        GCNII(cfg_loop).apply(p_loop, f, eij, ewj) ** 2))(feats)
    g_scan = jax.grad(lambda f: jnp.sum(
        GCNII(cfg_scan).apply(p_scan, f, eij, ewj) ** 2))(feats)
    np.testing.assert_allclose(np.asarray(g_loop), np.asarray(g_scan),
                               rtol=1e-5, atol=1e-6)


def test_normalize_adjacency_symmetric():
    edge_index = np.array([[0, 1], [1, 0]])
    ei, ew = normalize_adjacency(edge_index, 3)
    # self loops added; node 2 isolated -> only its self loop, weight 1
    loops = (ei[0] == ei[1])
    assert loops.sum() == 3
    i2 = np.where((ei[0] == 2) & (ei[1] == 2))[0]
    assert np.isclose(ew[i2], 1.0)


def test_pad_edges_static_shape():
    ei = np.array([[0, 1], [1, 2]])
    ew = np.array([0.5, 0.5], np.float32)
    pei, pew = pad_edges(ei, ew, 8)
    assert pei.shape == (2, 8) and pew.shape == (8,)
    assert pew[2:].sum() == 0


def test_gcn2_layer_formula():
    """out = (1-beta)*s + beta*(s W), s = (1-alpha) A x + alpha x0."""
    n, f = 4, 3
    rs = np.random.RandomState(1)
    x = jnp.array(rs.randn(n, f).astype(np.float32))
    x0 = jnp.array(rs.randn(n, f).astype(np.float32))
    ei = jnp.array([[0, 1, 2, 3], [1, 2, 3, 0]])
    ew = jnp.ones(4, jnp.float32)
    alpha, beta = 0.1, math.log(0.5 / 1 + 1)
    layer = GCN2Layer(f, alpha, beta)
    params = layer.init(RNG, x, x0, ei, ew)
    out = np.asarray(layer.apply(params, x, x0, ei, ew))
    A = np.zeros((n, n), np.float32)
    A[np.asarray(ei[1]), np.asarray(ei[0])] = 1.0
    s = (1 - alpha) * (A @ np.asarray(x)) + alpha * np.asarray(x0)
    W = np.asarray(params["params"]["weight"]["kernel"])
    expected = (1 - beta) * s + beta * (s @ W)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)


def _cluster_graph(n_per=10, seed=0):
    """Two dense clusters; same-cluster pairs are positives."""
    rs = np.random.RandomState(seed)
    n = 2 * n_per
    edges = []
    for c in range(2):
        base = c * n_per
        for i in range(n_per):
            for j in range(i + 1, n_per):
                if rs.rand() < 0.6:
                    edges.append((base + i, base + j))
                    edges.append((base + j, base + i))
    ei = np.array(edges).T
    ei, ew = normalize_adjacency(ei, n)
    feats = rs.randn(n, 8).astype(np.float32)
    feats[:n_per] += 1.0
    feats[n_per:] -= 1.0
    src, tgt, labels = [], [], []
    for _ in range(60):
        i, j = rs.randint(0, n, 2)
        src.append(i)
        tgt.append(j)
        labels.append(int((i < n_per) == (j < n_per)))
    return (jnp.array(feats), jnp.array(ei), jnp.array(ew),
            jnp.array(src), jnp.array(tgt), jnp.array(labels))


def test_gcn_two_tower_learns():
    import optax

    cfg = ModelConfig(model_name="gcn", gcn_hidden=16, gcn_layers=2,
                      gcn_feature_dim=8, hidden_dropout_prob=0.0)
    model = GCNTwoTower(cfg)
    feats, ei, ew, src, tgt, labels = _cluster_graph()
    params = model.init({"params": RNG}, feats, ei, ew, src, tgt, labels=labels)
    tx = optax.adam(3e-2)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        loss, g = jax.value_and_grad(
            lambda p: model.apply(p, feats, ei, ew, src, tgt,
                                  labels=labels).loss)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    first = None
    for _ in range(300):
        params, opt, loss = step(params, opt)
        first = first if first is not None else float(loss)
    assert float(loss) < first * 0.5, (first, float(loss))
    out = jax.jit(lambda p: model.apply(p, feats, ei, ew, src, tgt))(params)
    preds = (np.asarray(out.probs) >= 0.5).astype(int)
    acc = (preds == np.asarray(labels)).mean()
    assert acc > 0.8, acc
