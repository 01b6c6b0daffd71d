"""Fused LN+FFN kernel vs the XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vptr_tpu.models.layers import Mlp, layernorm_xla
from vptr_tpu.ops.fused_ffn import _reference_ffn, ffn_keep_mask, fused_ffn

RNG = np.random.default_rng(31)


def _args(s, c, h):
    x = jnp.asarray(RNG.normal(size=(s, c)).astype(np.float32))
    w1 = jnp.asarray(RNG.normal(size=(c, h)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(RNG.normal(size=(h,)).astype(np.float32) * 0.05)
    w2 = jnp.asarray(RNG.normal(size=(h, c)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(RNG.normal(size=(c,)).astype(np.float32) * 0.05)
    ls = jnp.asarray(1 + 0.1 * RNG.normal(size=(c,)).astype(np.float32))
    lb = jnp.asarray(0.1 * RNG.normal(size=(c,)).astype(np.float32))
    return x, w1, b1, w2, b2, ls, lb


def test_fused_ffn_fwd_and_grads_match_reference():
    s, c, h = 20, 32, 64          # ragged vs block 8
    args = _args(s, c, h)

    ref = _reference_ffn(*args)
    got = fused_ffn(*args, 0, 0.0, 8, True, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)

    def loss_fused(*a):
        return jnp.sum(fused_ffn(*a, 0, 0.0, 8, True, 8) ** 2)

    def loss_ref(*a):
        return jnp.sum(_reference_ffn(*a) ** 2)

    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for name, a, b in zip(["x", "w1", "b1", "w2", "b2", "ls", "lb"], gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3, err_msg=name)


def test_fused_ffn_dropout_matches_masked_reference():
    s, c, h, rate, seed = 16, 32, 64, 0.3, 321
    args = _args(s, c, h)
    keep = ffn_keep_mask(seed, s, h, rate)
    got = fused_ffn(*args, seed, rate, 8, True, 8)
    ref = _reference_ffn(*args, keep=keep, rate=rate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)

    def loss_fused(x, w1, b1, w2, b2, ls, lb):
        return jnp.sum(fused_ffn(x, w1, b1, w2, b2, ls, lb,
                                 seed, rate, 8, True, 8) ** 2)

    def loss_ref(x, w1, b1, w2, b2, ls, lb):
        return jnp.sum(_reference_ffn(x, w1, b1, w2, b2, ls, lb,
                                      keep=keep, rate=rate) ** 2)

    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for name, a, b in zip(["x", "w1", "b1", "w2", "b2", "ls", "lb"], gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3, err_msg=name)


def test_mlp_fused_matches_plain():
    """Mlp(fused=True, ln=...) on raw x == LayerNorm then plain Mlp — same
    param tree, same output, matching param grads (eval mode)."""
    dim, hidden, B, L = 32, 64, 4, 10
    x = jnp.asarray(RNG.normal(size=(B, L, dim)).astype(np.float32))
    ls = jnp.asarray(1 + 0.1 * RNG.normal(size=(dim,)).astype(np.float32))
    lb = jnp.asarray(0.1 * RNG.normal(size=(dim,)).astype(np.float32))

    plain = Mlp(dim, hidden)
    fused = Mlp(dim, hidden, fused=True)
    params = plain.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(fused.init(jax.random.PRNGKey(0), x))

    xn = layernorm_xla(x, ls, lb, jnp.float32)
    want = plain.apply(params, xn)
    got = fused.apply(params, x, ln=(ls, lb))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)

    ga = jax.grad(lambda p: jnp.sum(plain.apply(
        p, layernorm_xla(x, ls, lb, jnp.float32)) ** 2))(params)
    gb = jax.grad(lambda p: jnp.sum(fused.apply(
        p, x, ln=(ls, lb)) ** 2))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3), ga, gb)
