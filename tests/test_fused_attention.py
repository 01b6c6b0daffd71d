"""Pallas fully-fused attention sublayer vs the XLA reference (interpret
mode on CPU; the same kernels compile with Mosaic on TPU).

Covers: forward parity, ragged window batches, the fused Pallas BACKWARD
(input + all weight/bias grads vs jax.grad of the reference), in-kernel
dropout (fwd and bwd vs a mask-fed reference), and the MultiHeadAttention
``fused_full`` routing (same params/outputs as the unfused module).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vptr_tpu.models.layers import MultiHeadAttention
from vptr_tpu.ops.attention_core import dropout_keep_mask
from vptr_tpu.ops.fused_window_attention import (
    _reference_attention,
    fused_attention,
)

RNG = np.random.default_rng(21)


def _params(c):
    mk = lambda: jnp.asarray(RNG.normal(size=(c, c)).astype(np.float32) * 0.05)
    vk = lambda: jnp.asarray(RNG.normal(size=(c,)).astype(np.float32) * 0.05)
    return mk(), vk(), mk(), vk(), mk(), vk(), mk(), vk()


@pytest.mark.parametrize("use_bias", [False, True])
def test_fused_matches_reference(use_bias):
    bw, tokens, c, heads = 24, 16, 32, 4
    x = jnp.asarray(RNG.normal(size=(bw, tokens, c)).astype(np.float32))
    wq, bq, wk, bk, wv, bv, wo, bo = _params(c)
    bias = (jnp.asarray(RNG.normal(size=(heads, tokens, tokens))
                        .astype(np.float32)) if use_bias else None)

    ref = _reference_attention(x, x, wq, bq, wk, bk, wv, bv, wo, bo,
                               bias, num_heads=heads)
    got = fused_attention(x, x, wq, bq, wk, bk, wv, bv, wo, bo, bias,
                          0, heads, 0.0, 16, True)  # interpret=True
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_handles_ragged_window_batch():
    bw, tokens, c, heads = 10, 16, 32, 4   # 10 % block_windows(8) != 0
    x = jnp.asarray(RNG.normal(size=(bw, tokens, c)).astype(np.float32))
    wq, bq, wk, bk, wv, bv, wo, bo = _params(c)
    ref = _reference_attention(x, x, wq, bq, wk, bk, wv, bv, wo, bo,
                               None, num_heads=heads)
    got = fused_attention(x, x, wq, bq, wk, bk, wv, bv, wo, bo, None,
                          0, heads, 0.0, 8, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("use_bias", [False, True])
def test_fused_pallas_backward_matches_reference(use_bias):
    """The fused Pallas backward must produce correct input grads AND
    weight/bias grads (accumulated across grid steps), ragged batch included,
    with x_qk != x_v (the NAR decoder self-attention case)."""
    bw, tokens, c, heads = 10, 16, 32, 4   # ragged vs block 8
    x_qk = jnp.asarray(RNG.normal(size=(bw, tokens, c)).astype(np.float32))
    x_v = jnp.asarray(RNG.normal(size=(bw, tokens, c)).astype(np.float32))
    params = _params(c)
    bias = (jnp.asarray(RNG.normal(size=(heads, tokens, tokens))
                        .astype(np.float32)) if use_bias else None)

    def loss_fused(x_qk, x_v, *params_and_bias):
        out = fused_attention(x_qk, x_v, *params_and_bias,
                              0, heads, 0.0, 8, True)
        return jnp.sum(out ** 2)

    def loss_ref(x_qk, x_v, *params_and_bias):
        out = _reference_attention(x_qk, x_v, *params_and_bias,
                                   num_heads=heads)
        return jnp.sum(out ** 2)

    args = (x_qk, x_v) + params + (bias,)
    n = len(args) if use_bias else len(args) - 1
    gf = jax.grad(loss_fused, argnums=tuple(range(n)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(n)))(*args)
    names = ["x_qk", "x_v", "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
             "bias"]
    for name, a, b in zip(names, gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3, err_msg=name)


def test_fused_broadcast_bias_grad():
    """(1, T, T) causal-mask-style bias gets a summed-over-heads grad."""
    bw, tokens, c, heads = 8, 16, 32, 4
    x = jnp.asarray(RNG.normal(size=(bw, tokens, c)).astype(np.float32))
    params = _params(c)
    bias = jnp.asarray(RNG.normal(size=(1, tokens, tokens))
                       .astype(np.float32))

    def loss_fused(bias):
        return jnp.sum(fused_attention(x, x, *params, bias,
                                       0, heads, 0.0, 8, True) ** 2)

    def loss_ref(bias):
        return jnp.sum(_reference_attention(
            x, x, *params, jnp.broadcast_to(bias, (heads, tokens, tokens)),
            num_heads=heads) ** 2)

    gf = jax.grad(loss_fused)(bias)
    gr = jax.grad(loss_ref)(bias)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               atol=1e-3, rtol=1e-3)


def test_fused_dropout_fwd_and_bwd_match_masked_reference():
    """In-kernel dropout: fwd and bwd must equal the XLA reference fed the
    SAME keep mask via the shared jnp oracle (dropout_keep_mask)."""
    bw, tokens, c, heads, rate, seed = 12, 16, 32, 4, 0.3, 991
    x_qk = jnp.asarray(RNG.normal(size=(bw, tokens, c)).astype(np.float32))
    x_v = jnp.asarray(RNG.normal(size=(bw, tokens, c)).astype(np.float32))
    params = _params(c)
    keep = dropout_keep_mask(seed, bw, heads, tokens, rate)

    got = fused_attention(x_qk, x_v, *params, None, seed, heads, rate,
                          8, True)
    ref = _reference_attention(x_qk, x_v, *params, None, num_heads=heads,
                               keep=keep, rate=rate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)

    def loss_fused(x_qk, *params):
        return jnp.sum(fused_attention(x_qk, x_v, *params, None, seed,
                                       heads, rate, 8, True) ** 2)

    def loss_ref(x_qk, *params):
        return jnp.sum(_reference_attention(
            x_qk, x_v, *params, None, num_heads=heads, keep=keep,
            rate=rate) ** 2)

    gf = jax.grad(loss_fused, argnums=tuple(range(9)))(x_qk, *params)
    gr = jax.grad(loss_ref, argnums=tuple(range(9)))(x_qk, *params)
    names = ["x_qk", "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo"]
    for name, a, b in zip(names, gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3, err_msg=name)


def test_mha_fused_full_matches_unfused():
    """fused_full routing: same param tree as nn.Dense, same outputs, and a
    matching gradient through module parameters."""
    dim, heads, L, B = 32, 4, 16, 6
    x = jnp.asarray(RNG.normal(size=(B, L, dim)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(B, L, dim)).astype(np.float32))
    mask = jnp.asarray(np.triu(np.ones((L, L), bool), k=1))

    plain = MultiHeadAttention(dim, heads, fused=False)
    full = MultiHeadAttention(dim, heads, fused=True, fused_full=True,
                              fused_block=8)
    params = plain.init(jax.random.PRNGKey(0), x, x, x)
    # identical param trees (checkpoint compatibility)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(full.init(jax.random.PRNGKey(0), x, x, x))

    for kwargs in [dict(), dict(mask=mask)]:
        a = plain.apply(params, x, x, v, **kwargs)
        b = full.apply(params, x, x, v, **kwargs)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)

    def loss(mod):
        return lambda p: jnp.sum(mod.apply(p, x, x, v) ** 2)

    ga = jax.grad(loss(plain))(params)
    gb = jax.grad(loss(full))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3), ga, gb)


def test_mha_fused_full_cross_attention_falls_back():
    """q_in is not k_in -> XLA fallback must be taken (and stay correct)."""
    dim, heads, L, B = 32, 4, 16, 4
    q = jnp.asarray(RNG.normal(size=(B, L, dim)).astype(np.float32))
    kv = jnp.asarray(RNG.normal(size=(B, L, dim)).astype(np.float32))
    plain = MultiHeadAttention(dim, heads, fused=False)
    full = MultiHeadAttention(dim, heads, fused=True, fused_full=True)
    params = plain.init(jax.random.PRNGKey(0), q, kv, kv)
    a = plain.apply(params, q, kv, kv)
    b = full.apply(params, q, kv, kv)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)
