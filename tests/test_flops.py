"""utils/flops.py: exact dot/conv FLOP counting from traced jaxprs.

The image benches report MFU from these counts (the remote backend's
compiled.cost_analysis() under-reports, and hand formulas don't cover
grouped/strided conv stacks)."""

import jax
import jax.numpy as jnp

from item_alignment_tpu.utils.flops import count_flops


def test_matmul_exact():
    a, b = jnp.zeros((8, 32)), jnp.zeros((32, 16))
    assert count_flops(lambda a, b: a @ b, a, b) == 2 * 8 * 32 * 16


def test_conv_strided_exact():
    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x, w = jnp.zeros((2, 16, 16, 3)), jnp.zeros((3, 3, 3, 8))
    # out 8x8, per output element 3*3*3 MACs
    assert count_flops(f, x, w) == 2 * 2 * 8 * 8 * 8 * 9 * 3


def test_grouped_conv_exact():
    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=4)
    x, w = jnp.zeros((1, 8, 8, 16)), jnp.zeros((3, 3, 4, 16))
    assert count_flops(f, x, w) == 2 * 1 * 8 * 8 * 16 * 9 * (16 // 4)


def test_scan_multiplies_by_length():
    def f(p, x):
        def body(c, xi):
            return c + jnp.sum(xi @ p), None
        return jax.lax.scan(body, 0.0, x)[0]
    p, x = jnp.zeros((16, 16)), jnp.zeros((5, 4, 16))
    assert count_flops(f, p, x) == 5 * 2 * 4 * 16 * 16


def test_grad_counts_transposed_dots():
    def f(p, x):
        return jnp.sum((x @ p) ** 2)
    p, x = jnp.zeros((16, 16)), jnp.zeros((4, 16))
    fwd = count_flops(f, p, x)
    # grad re-runs the fwd dot and adds dp = x^T @ dy and dx = dy @ p^T
    assert count_flops(jax.grad(f, argnums=(0, 1)), p, x) == 3 * fwd


def test_flagship_encoder_matches_hand_formula():
    from item_alignment_tpu.config import ModelConfig
    from item_alignment_tpu.models.text import RobertaOneTower

    cfg = ModelConfig(hidden_size=64, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=128,
                      vocab_size=100, max_seq_len=8, max_seq_len_pv=8,
                      max_position_embeddings=64, hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    m = RobertaOneTower(cfg)
    B, S = 2, cfg.pair_seq_len
    ids = jnp.ones((B, S), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    params = jax.jit(m.init)({"params": jax.random.PRNGKey(0)}, ids, mask)
    got = count_flops(lambda p: m.apply(p, ids, mask).probs, params)
    H, inter, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    hand = L * (2 * B * S * (4 * H * H + 2 * H * inter) + 4 * B * S * S * H)
    # hand covers the encoder only; the classification head adds <1%
    assert hand <= got <= hand * 1.01
