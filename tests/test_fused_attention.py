"""Pallas fused window attention vs the XLA reference (interpret mode on
CPU; the same kernel compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vptr_tpu.ops.fused_window_attention import (
    _reference_window_attention,
    fused_window_attention,
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

    ref = _reference_window_attention(x, wq, bq, wk, bk, wv, bv, wo, bo,
                                      bias, num_heads=heads)
    got = fused_window_attention(x, wq, bq, wk, bk, wv, bv, wo, bo, bias,
                                 heads, 16, True)  # interpret=True
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_handles_ragged_window_batch():
    bw, tokens, c, heads = 10, 16, 32, 4   # 10 % block_windows(8) != 0
    x = jnp.asarray(RNG.normal(size=(bw, tokens, c)).astype(np.float32))
    wq, bq, wk, bk, wv, bv, wo, bo = _params(c)
    ref = _reference_window_attention(x, wq, bq, wk, bk, wv, bv, wo, bo,
                                      None, num_heads=heads)
    got = fused_window_attention(x, wq, bq, wk, bk, wv, bv, wo, bo, None,
                                 heads, 8, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_gradients_match_reference():
    bw, tokens, c, heads = 8, 16, 32, 4
    x = jnp.asarray(RNG.normal(size=(bw, tokens, c)).astype(np.float32))
    wq, bq, wk, bk, wv, bv, wo, bo = _params(c)

    def loss_fused(x, wq):
        out = fused_window_attention(x, wq, bq, wk, bk, wv, bv, wo, bo,
                                     None, heads, 8, True)
        return jnp.sum(out ** 2)

    def loss_ref(x, wq):
        out = _reference_window_attention(x, wq, bq, wk, bk, wv, bv, wo, bo,
                                          None, num_heads=heads)
        return jnp.sum(out ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1))(x, wq)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, wq)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)
