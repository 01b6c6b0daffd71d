"""Pallas attention-core kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vptr_tpu.models.layers import MultiHeadAttention
from vptr_tpu.ops.attention_core import _reference_core, attention_core

RNG = np.random.default_rng(33)


@pytest.mark.parametrize("t,use_bias", [(16, False), (16, True),
                                        (19, False), (19, True)])
def test_core_matches_reference(t, use_bias):
    b, h, d = 12, 4, 16
    q = jnp.asarray(RNG.normal(size=(b, h, t, d)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(b, h, t, d)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(b, h, t, d)).astype(np.float32))
    bias = (jnp.asarray(RNG.normal(size=(h, t, t)).astype(np.float32))
            if use_bias else None)
    ref = _reference_core(q, k, v, bias)
    got = attention_core(q, k, v, bias, 8, True)  # interpret
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_core_ragged_batch_and_grads():
    b, h, t, d = 10, 2, 16, 8      # 10 % block(8) != 0
    q = jnp.asarray(RNG.normal(size=(b, h, t, d)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(b, h, t, d)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(b, h, t, d)).astype(np.float32))

    def loss_fused(q, k, v):
        return jnp.sum(attention_core(q, k, v, None, 8, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_core(q, k, v, None) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_mha_fused_matches_unfused():
    """The fused flag must not change results (self-attention, causal mask,
    rpe-style bias) — same params, same output."""
    dim, heads, L, B = 24, 4, 19, 6
    x = jnp.asarray(RNG.normal(size=(B, L, dim)).astype(np.float32))
    mask = jnp.asarray(np.triu(np.ones((L, L), bool), k=1))
    bias = jnp.asarray(RNG.normal(size=(heads, L, L)).astype(np.float32))

    plain = MultiHeadAttention(dim, heads, fused=False)
    fused = MultiHeadAttention(dim, heads, fused=True)
    params = plain.init(jax.random.PRNGKey(0), x, x, x)
    for kwargs in [dict(), dict(mask=mask), dict(bias=bias),
                   dict(bias=bias, mask=mask)]:
        a = plain.apply(params, x, x, x, **kwargs)
        b = fused.apply(params, x, x, x, **kwargs)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("use_bias", [False, True])
def test_core_pallas_backward_matches_reference(use_bias):
    """The hand-written Pallas backward must match jax.vjp of the reference
    (q/k/v and bias grads), including ragged batches."""
    b, h, t, d = 10, 3, 19, 8
    q = jnp.asarray(RNG.normal(size=(b, h, t, d)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(b, h, t, d)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(b, h, t, d)).astype(np.float32))
    bias = (jnp.asarray(RNG.normal(size=(h, t, t)).astype(np.float32))
            if use_bias else None)

    def loss_fused(*args):
        return jnp.sum(attention_core(*args, 8, True) ** 2)

    def loss_ref(*args):
        return jnp.sum(_reference_core(*args) ** 2)

    n_args = 4 if use_bias else 3
    args = (q, k, v) + ((bias,) if use_bias else (None,))
    gf = jax.grad(loss_fused, argnums=tuple(range(n_args)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(n_args)))(*args)
    for name, a, b_ in zip("qkvb", gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-3, rtol=1e-3, err_msg=name)


def test_core_broadcast_bias_grad():
    """(1, T, T) bias (causal-mask style) gets a summed-over-heads grad."""
    b, h, t, d = 4, 2, 16, 8
    q = jnp.asarray(RNG.normal(size=(b, h, t, d)).astype(np.float32))
    bias = jnp.asarray(RNG.normal(size=(1, t, t)).astype(np.float32))

    def loss_fused(bias):
        return jnp.sum(attention_core(q, q, q, bias, 4, True) ** 2)

    def loss_ref(bias):
        return jnp.sum(_reference_core(
            q, q, q, jnp.broadcast_to(bias, (h, t, t))) ** 2)

    gf = jax.grad(loss_fused)(bias)
    gr = jax.grad(loss_ref)(bias)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               atol=1e-3, rtol=1e-3)
