"""Pallas fused conv+LayerNormHWC+GELU vs the XLA reference (interpret mode
on CPU; the same kernels compile with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from vptr_tpu.models.layers import MlpDWBN
from vptr_tpu.ops.fused_conv_ln import _reference, conv_ln_gelu

RNG = np.random.default_rng(41)


def _inputs(n=6, hw=64, cin=24, cout=48):
    x = jnp.asarray(RNG.normal(size=(n, hw, cin)).astype(np.float32))
    w = jnp.asarray(RNG.normal(size=(cin, cout)).astype(np.float32) * 0.1)
    b = jnp.asarray(RNG.normal(size=(cout,)).astype(np.float32) * 0.1)
    scale = jnp.asarray(RNG.normal(size=(hw, cout)).astype(np.float32) * 0.2
                        + 1.0)
    bias2 = jnp.asarray(RNG.normal(size=(hw, cout)).astype(np.float32) * 0.1)
    return x, w, b, scale, bias2


def test_forward_matches_reference():
    args = _inputs()
    got = conv_ln_gelu(*args, 1e-5, True)
    want = _reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_backward_matches_reference():
    args = _inputs()

    def loss_fused(*a):
        return jnp.sum(conv_ln_gelu(*a, 1e-5, True) ** 2)

    def loss_ref(*a):
        return jnp.sum(_reference(*a) ** 2)

    gf = jax.grad(loss_fused, argnums=tuple(range(5)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(5)))(*args)
    for name, a, b in zip(["x", "w", "b", "scale", "bias2"], gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4, err_msg=name)


def test_mlpdwbn_fused_ln_matches_unfused():
    """fused_ln routing in MlpDWBN: identical param tree, same outputs and
    parameter gradients as the XLA path."""
    dim, hidden = 24, 48
    x = jnp.asarray(RNG.normal(size=(2, 3, 8, 8, dim)).astype(np.float32))
    plain = MlpDWBN(dim, hidden, norm="layer", fused_ln=False)
    fused = MlpDWBN(dim, hidden, norm="layer", fused_ln=True)
    params = plain.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(fused.init(jax.random.PRNGKey(0), x))

    a = plain.apply(params, x)
    b = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)

    ga = jax.grad(lambda p: jnp.sum(plain.apply(p, x) ** 2))(params)
    gb = jax.grad(lambda p: jnp.sum(fused.apply(p, x) ** 2))(params)
    jax.tree_util.tree_map(
        lambda u, v: np.testing.assert_allclose(
            np.asarray(u), np.asarray(v), atol=2e-3, rtol=2e-3), ga, gb)


def test_ragged_sample_count_and_blocks():
    """Sample counts not divisible by block_samples pad with zeros; padded
    samples must not perturb outputs or accumulated weight grads."""
    x, w, b, scale, bias2 = _inputs(n=7)

    a = conv_ln_gelu(x, w, b, scale, bias2, 1e-5, True, 4)   # pads 7 -> 8
    want = _reference(x, w, b, scale, bias2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    gf = jax.grad(lambda w: jnp.sum(
        conv_ln_gelu(x, w, b, scale, bias2, 1e-5, True, 4) ** 2))(w)
    gr = jax.grad(lambda w: jnp.sum(
        _reference(x, w, b, scale, bias2) ** 2))(w)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               atol=2e-4, rtol=2e-4)
