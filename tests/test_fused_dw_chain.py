"""Fused conv-FFN middle chain (LN+GELU+dw3x3+LN+GELU+drop) vs XLA oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vptr_tpu.models.layers import MlpDWBN
from vptr_tpu.ops.fused_dw_chain import (
    _reference_dw_chain,
    dw_keep_mask,
    fused_dw_chain,
)

RNG = np.random.default_rng(41)


def _args(n, hw, c):
    x = jnp.asarray(RNG.normal(size=(n, hw, c)).astype(np.float32))
    taps = jnp.asarray(RNG.normal(size=(9, c)).astype(np.float32) * 0.2)
    dwb = jnp.asarray(RNG.normal(size=(c,)).astype(np.float32) * 0.05)
    s1 = jnp.asarray(1 + 0.1 * RNG.normal(size=(hw, c)).astype(np.float32))
    b1 = jnp.asarray(0.1 * RNG.normal(size=(hw, c)).astype(np.float32))
    s2 = jnp.asarray(1 + 0.1 * RNG.normal(size=(hw, c)).astype(np.float32))
    b2 = jnp.asarray(0.1 * RNG.normal(size=(hw, c)).astype(np.float32))
    return x, taps, dwb, s1, b1, s2, b2


def test_fused_dw_chain_fwd_and_grads():
    n, w, c = 6, 8, 32                    # 8x8 grid -> hw 64, ragged vs 4
    args = _args(n, w * w, c)

    ref = _reference_dw_chain(*args, w=w)
    got = fused_dw_chain(*args, 0, w, 0.0, 4, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)

    def loss_fused(*a):
        return jnp.sum(fused_dw_chain(*a, 0, w, 0.0, 4, True) ** 2)

    def loss_ref(*a):
        return jnp.sum(_reference_dw_chain(*a, w=w) ** 2)

    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    names = ["x", "taps", "dwb", "s1", "b1", "s2", "b2"]
    for name, a, b in zip(names, gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3, err_msg=name)


def test_fused_dw_chain_dropout():
    n, w, c, rate, seed = 4, 8, 32, 0.3, 17
    args = _args(n, w * w, c)
    keep = dw_keep_mask(seed, n, w * w, c, rate)
    got = fused_dw_chain(*args, seed, w, rate, 4, True)
    ref = _reference_dw_chain(*args, w=w, keep=keep, rate=rate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_mlpdwbn_fused_dw_matches_plain():
    """MlpDWBN(fused_dw=True) == plain MlpDWBN: same param tree, same
    output, matching param grads (layer-norm flavor, eval mode)."""
    n, t, h, w, dim, hidden = 2, 3, 8, 8, 16, 32
    x = jnp.asarray(RNG.normal(size=(n, t, h, w, dim)).astype(np.float32))
    plain = MlpDWBN(dim, hidden, norm="layer")
    fused = MlpDWBN(dim, hidden, norm="layer", fused_dw=True)
    params = plain.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(fused.init(jax.random.PRNGKey(0), x))

    a = plain.apply(params, x)
    b = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-4, rtol=1e-4)

    ga = jax.grad(lambda p: jnp.mean(plain.apply(p, x) ** 2))(params)
    gb = jax.grad(lambda p: jnp.mean(fused.apply(p, x) ** 2))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3), ga, gb)
