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
    got = attention_core(q, k, v, bias, 0, 0.0, 8, True)  # interpret
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_core_ragged_batch_and_grads():
    b, h, t, d = 10, 2, 16, 8      # 10 % block(8) != 0
    q = jnp.asarray(RNG.normal(size=(b, h, t, d)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(b, h, t, d)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(b, h, t, d)).astype(np.float32))

    def loss_fused(q, k, v):
        return jnp.sum(attention_core(q, k, v, None, 0, 0.0, 8, True) ** 2)

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
        return jnp.sum(attention_core(*args, 0, 0.0, 8, True) ** 2)

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
        return jnp.sum(attention_core(q, q, q, bias, 0, 0.0, 4, True) ** 2)

    def loss_ref(bias):
        return jnp.sum(_reference_core(
            q, q, q, jnp.broadcast_to(bias, (h, t, t))) ** 2)

    gf = jax.grad(loss_fused)(bias)
    gr = jax.grad(loss_ref)(bias)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               atol=1e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# Rectangular (Lq != Lk) cross-attention — NAR enc-dec at Tp != Tf
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("tq,tk,use_bias", [
    (10, 2, False),    # nar_bair enc-dec: Tf=10 queries over Tp=2 memory
    (10, 2, True),
    (160, 32, False),  # TSLMA windows at BAIR geometry: (Tf*16, Tp*16)
    (19, 5, True),
])
def test_core_rectangular_matches_reference(tq, tk, use_bias):
    b, h, d = 8, 4, 16
    q = jnp.asarray(RNG.normal(size=(b, h, tq, d)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(b, h, tk, d)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(b, h, tk, d)).astype(np.float32))
    bias = (jnp.asarray(RNG.normal(size=(h, tq, tk)).astype(np.float32))
            if use_bias else None)
    ref = _reference_core(q, k, v, bias)
    got = attention_core(q, k, v, bias, 0, 0.0, 8, True)  # interpret
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("use_bias", [False, True])
def test_core_rectangular_backward_matches_reference(use_bias):
    b, h, tq, tk, d = 6, 3, 10, 2, 8
    q = jnp.asarray(RNG.normal(size=(b, h, tq, d)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(b, h, tk, d)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(b, h, tk, d)).astype(np.float32))
    bias = (jnp.asarray(RNG.normal(size=(h, tq, tk)).astype(np.float32))
            if use_bias else None)

    def loss_fused(*args):
        return jnp.sum(attention_core(*args, 0, 0.0, 4, True) ** 2)

    def loss_ref(*args):
        return jnp.sum(_reference_core(*args) ** 2)

    n_args = 4 if use_bias else 3
    args = (q, k, v) + ((bias,) if use_bias else (None,))
    gf = jax.grad(loss_fused, argnums=tuple(range(n_args)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(n_args)))(*args)
    for name, a, b_ in zip("qkvb", gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4, err_msg=name)


def test_core_rectangular_dropout_matches_masked_reference():
    """Rectangular kernel dropout (fwd + bwd) vs the mask-oracle reference."""
    from vptr_tpu.ops.attention_core import dropout_keep_mask

    b, h, tq, tk, d, rate, seed = 8, 2, 10, 2, 8, 0.3, 99
    q = jnp.asarray(RNG.normal(size=(b, h, tq, d)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(b, h, tk, d)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(b, h, tk, d)).astype(np.float32))
    keep = dropout_keep_mask(seed, b, h, tq, rate, tk=tk)

    ref = _reference_core(q, k, v, None, keep=keep, rate=rate)
    got = attention_core(q, k, v, None, seed, rate, 8, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    def loss_fused(q, k, v):
        return jnp.sum(attention_core(q, k, v, None, seed, rate, 8, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_core(q, k, v, None, keep=keep,
                                       rate=rate) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-3, rtol=1e-3, err_msg=name)


def test_mha_fused_cross_attention_matches_unfused(monkeypatch):
    """MultiHeadAttention's fused gate admits Lq != Lk cross-attention;
    the result must match the XLA path with the same params. The shipped
    routing sends rect shapes to XLA (measured faster at small Lk, round 4)
    so the kernel route is forced here to keep it covered."""
    from vptr_tpu.models import layers as layers_mod

    monkeypatch.setattr(layers_mod, "FUSED_RECT_DISABLE", False)
    dim, heads, lq, lk, B = 24, 4, 10, 2, 6
    q = jnp.asarray(RNG.normal(size=(B, lq, dim)).astype(np.float32))
    kv = jnp.asarray(RNG.normal(size=(B, lk, dim)).astype(np.float32))

    plain = MultiHeadAttention(dim, heads, fused=False)
    fused = MultiHeadAttention(dim, heads, fused=True)
    params = plain.init(jax.random.PRNGKey(0), q, kv, kv)
    a = plain.apply(params, q, kv, kv)
    b = fused.apply(params, q, kv, kv)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# In-kernel attention-weight dropout (counter-based hash PRNG)
# ---------------------------------------------------------------------------

def test_core_dropout_matches_masked_reference():
    """With dropout active, the kernel must equal the XLA reference fed the
    SAME keep mask (re-derived via the plain-jnp twin of the in-kernel hash).
    Proves the kernel's mask generation, scaling, and placement."""
    from vptr_tpu.ops.attention_core import dropout_keep_mask

    b, h, t, d, rate, seed = 12, 4, 16, 8, 0.3, 1234
    q = jnp.asarray(RNG.normal(size=(b, h, t, d)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(b, h, t, d)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(b, h, t, d)).astype(np.float32))

    keep = dropout_keep_mask(seed, b, h, t, rate)
    frac = float(np.asarray(keep).mean())
    assert abs(frac - (1 - rate)) < 0.03, f"keep fraction {frac} vs {1-rate}"

    ref = _reference_core(q, k, v, None, keep=keep, rate=rate)
    got = attention_core(q, k, v, None, seed, rate, 8, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # different seed -> different output
    other = attention_core(q, k, v, None, seed + 1, rate, 8, True)
    assert not np.allclose(np.asarray(got), np.asarray(other))


def test_core_dropout_backward_matches_masked_reference():
    """The Pallas backward regenerates the forward mask from the seed: its
    grads must equal jax.grad of the mask-fed XLA reference."""
    from vptr_tpu.ops.attention_core import dropout_keep_mask

    b, h, t, d, rate, seed = 10, 3, 19, 8, 0.25, 77
    q = jnp.asarray(RNG.normal(size=(b, h, t, d)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(b, h, t, d)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(b, h, t, d)).astype(np.float32))
    bias = jnp.asarray(RNG.normal(size=(h, t, t)).astype(np.float32))
    keep = dropout_keep_mask(seed, b, h, t, rate)

    def loss_fused(q, k, v, bias):
        return jnp.sum(attention_core(q, k, v, bias, seed, rate, 8, True) ** 2)

    def loss_ref(q, k, v, bias):
        return jnp.sum(_reference_core(q, k, v, bias, keep=keep,
                                       rate=rate) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b_ in zip("qkvb", gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-3, rtol=1e-3, err_msg=name)


@pytest.mark.slow
def test_mha_fused_dropout_trains():
    """MultiHeadAttention(fused=True) with attention dropout active must run
    (non-deterministic path), differ from the deterministic output, and have
    ~E[out] equal to it."""
    dim, heads, L, B = 24, 4, 16, 8
    x = jnp.asarray(RNG.normal(size=(B, L, dim)).astype(np.float32))
    mha = MultiHeadAttention(dim, heads, dropout=0.4, fused=True)
    params = mha.init(jax.random.PRNGKey(0), x, x, x)
    det = mha.apply(params, x, x, x, deterministic=True)
    outs = [mha.apply(params, x, x, x, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(i)})
            for i in range(32)]
    assert not np.allclose(np.asarray(outs[0]), np.asarray(outs[1]))
    avg = np.mean([np.asarray(o) for o in outs], axis=0)
    # dropout is unbiased: the seed-average approaches the deterministic out
    err = np.abs(avg - np.asarray(det)).mean() / np.abs(det).mean()
    assert err < 0.25, f"dropout not unbiased-ish: rel err {err}"
