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


@pytest.mark.parametrize("use_bias", [False, True])
def test_fused_padded_tokens_matches_reference(use_bias):
    """Token counts that are NOT a sublane multiple (e.g. the T=19 temporal
    attention) are padded in-kernel with -1e30-masked key columns; fwd and
    every grad must still match the unpadded XLA reference."""
    bw, tokens, c, heads = 6, 19, 32, 4      # 19 % 8 != 0 (f32 sublane)
    x_qk = jnp.asarray(RNG.normal(size=(bw, tokens, c)).astype(np.float32))
    x_v = jnp.asarray(RNG.normal(size=(bw, tokens, c)).astype(np.float32))
    params = _params(c)
    causal = np.triu(np.full((tokens, tokens), -1e30, np.float32), k=1)
    bias = jnp.asarray(causal)[None] if use_bias else None

    ref = _reference_attention(x_qk, x_v, *params,
                               (jnp.broadcast_to(bias, (heads,) + bias.shape[1:])
                                if use_bias else None), num_heads=heads)
    got = fused_attention(x_qk, x_v, *params, bias, 0, heads, 0.0, 4, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)

    def loss_fused(x_qk, x_v, *params):
        return jnp.sum(fused_attention(x_qk, x_v, *params, bias,
                                       0, heads, 0.0, 4, True) ** 2)

    def loss_ref(x_qk, x_v, *params):
        b = (jnp.broadcast_to(bias, (heads, tokens, tokens))
             if use_bias else None)
        return jnp.sum(_reference_attention(
            x_qk, x_v, *params, b, num_heads=heads) ** 2)

    gf = jax.grad(loss_fused, argnums=tuple(range(10)))(x_qk, x_v, *params)
    gr = jax.grad(loss_ref, argnums=tuple(range(10)))(x_qk, x_v, *params)
    names = ["x_qk", "x_v", "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo"]
    for name, a, b in zip(names, gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3, err_msg=name)


def test_fused_padded_tokens_dropout():
    """Padded path with in-kernel dropout: matches the oracle keep mask
    generated at the PADDED token count and sliced back."""
    bw, tokens, c, heads, rate, seed = 6, 19, 32, 4, 0.3, 77
    lp = 24                                   # 19 -> next f32 sublane multiple
    x = jnp.asarray(RNG.normal(size=(bw, tokens, c)).astype(np.float32))
    params = _params(c)
    keep = dropout_keep_mask(seed, bw, heads, lp, rate)[:, :, :tokens, :tokens]

    got = fused_attention(x, x, *params, None, seed, heads, rate, 4, True)
    ref = _reference_attention(x, x, *params, None, num_heads=heads,
                               keep=keep, rate=rate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_mha_fused_full_unaligned_tokens_routes_to_kernel():
    """The L=19 causal (FAR temporal) case now runs the fully-fused kernel
    and must match the unfused module exactly, grads included."""
    dim, heads, L, B = 32, 4, 19, 4
    x = jnp.asarray(RNG.normal(size=(B, L, dim)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(B, L, dim)).astype(np.float32))
    mask = jnp.asarray(np.triu(np.ones((L, L), bool), k=1))
    plain = MultiHeadAttention(dim, heads, fused=False)
    full = MultiHeadAttention(dim, heads, fused=True, fused_full=True,
                              fused_block=8)
    params = plain.init(jax.random.PRNGKey(0), x, x, x)
    a = plain.apply(params, x, x, v, mask=mask)
    b = full.apply(params, x, x, v, mask=mask)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)

    def loss(mod):
        return lambda p: jnp.sum(mod.apply(p, x, x, v, mask=mask) ** 2)

    ga = jax.grad(loss(plain))(params)
    gb = jax.grad(loss(full))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3), ga, gb)


@pytest.mark.parametrize("tokens,use_pos,use_bias",
                         [(16, True, False),   # encoder window attention
                          (16, False, True),   # rpe window attention
                          (19, True, True)])   # causal temporal, padded
def test_fused_ln_matches_reference(tokens, use_pos, use_bias):
    """LN-folded single-input kernel: fwd + all grads (incl. the LayerNorm
    affine and THROUGH the norm to x) vs the XLA oracle."""
    from vptr_tpu.ops.fused_window_attention import (
        _reference_attention_ln,
        fused_attention_ln,
    )

    bw, c, heads = 6, 32, 4
    x = jnp.asarray(RNG.normal(size=(bw, tokens, c)).astype(np.float32))
    params = _params(c)
    ls = jnp.asarray(1.0 + 0.1 * RNG.normal(size=(c,)).astype(np.float32))
    lb = jnp.asarray(0.1 * RNG.normal(size=(c,)).astype(np.float32))
    pos = (jnp.asarray(RNG.normal(size=(tokens, c)).astype(np.float32))
           if use_pos else None)
    bias = (jnp.asarray(RNG.normal(size=(heads, tokens, tokens))
                        .astype(np.float32)) if use_bias else None)

    ref = _reference_attention_ln(x, *params, ls, lb, pos, bias,
                                  num_heads=heads)
    got = fused_attention_ln(x, *params, ls, lb, pos, bias, 0, heads,
                             0.0, 4, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)

    def loss_fused(x, *pt):
        return jnp.sum(fused_attention_ln(x, *pt[:8], pt[8], pt[9], pos,
                                          bias, 0, heads, 0.0, 4, True) ** 2)

    def loss_ref(x, *pt):
        return jnp.sum(_reference_attention_ln(
            x, *pt[:8], pt[8], pt[9], pos, bias, num_heads=heads) ** 2)

    args = (x,) + params + (ls, lb)
    gf = jax.grad(loss_fused, argnums=tuple(range(11)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(11)))(*args)
    names = ["x", "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo", "ls", "lb"]
    for name, a, b in zip(names, gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3, err_msg=name)


def test_fused_ln_dropout():
    from vptr_tpu.ops.fused_window_attention import (
        _reference_attention_ln,
        fused_attention_ln,
    )

    bw, tokens, c, heads, rate, seed = 6, 16, 32, 4, 0.3, 55
    x = jnp.asarray(RNG.normal(size=(bw, tokens, c)).astype(np.float32))
    params = _params(c)
    ls = jnp.ones((c,), jnp.float32)
    lb = jnp.zeros((c,), jnp.float32)
    keep = dropout_keep_mask(seed, bw, heads, tokens, rate)
    got = fused_attention_ln(x, *params, ls, lb, None, None, seed, heads,
                             rate, 4, True)
    ref = _reference_attention_ln(x, *params, ls, lb, None, None,
                                  num_heads=heads, keep=keep, rate=rate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_mha_ln_folding_matches_explicit_norm():
    """MultiHeadAttention(ln=...) on raw x == LayerNorm in XLA then MHA —
    for the folded kernel path AND the unfused fallback, grads included."""
    from vptr_tpu.models.layers import layernorm_xla

    dim, heads, L, B = 32, 4, 19, 4
    x = jnp.asarray(RNG.normal(size=(B, L, dim)).astype(np.float32))
    pos = jnp.asarray(RNG.normal(size=(L, dim)).astype(np.float32))
    mask = jnp.asarray(np.triu(np.ones((L, L), bool), k=1))
    ls = jnp.asarray(1.0 + 0.1 * RNG.normal(size=(dim,)).astype(np.float32))
    lb = jnp.asarray(0.1 * RNG.normal(size=(dim,)).astype(np.float32))

    plain = MultiHeadAttention(dim, heads, fused=False)
    params = plain.init(jax.random.PRNGKey(0), x, x, x)

    xn = layernorm_xla(x, ls, lb, jnp.float32)
    want = plain.apply(params, xn + pos, xn + pos, xn, mask=mask)

    for fused, full in [(False, False), (True, True)]:
        mod = MultiHeadAttention(dim, heads, fused=fused, fused_full=full,
                                 fused_block=8)
        got = mod.apply(params, x, x, x, mask=mask, ln=(ls, lb), qk_pos=pos)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=f"fused={fused}")

    def loss(mod, with_ln):
        if with_ln:
            return lambda p: jnp.sum(mod.apply(
                p, x, x, x, mask=mask, ln=(ls, lb), qk_pos=pos) ** 2)
        return lambda p: jnp.sum(mod.apply(
            p, xn + pos, xn + pos, xn, mask=mask) ** 2)

    ga = jax.grad(loss(plain, False))(params)
    gb = jax.grad(loss(MultiHeadAttention(dim, heads, fused=True,
                                          fused_full=True, fused_block=8),
                       True))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3), ga, gb)


def test_fused_ln_res_matches_reference():
    """Residual-folded sublayer kernel: out = x + scale*attn(LN(x)+pos) —
    fwd + grads (incl. through the skip path) vs the XLA oracle. scale is
    non-differentiable dropout data (the kernel returns zero for it by
    design), so it is held out of the grad argnums."""
    from vptr_tpu.ops.fused_window_attention import (
        _reference_attention_ln_res,
        fused_attention_ln_res,
    )

    bw, tokens, c, heads = 6, 16, 32, 4
    x = jnp.asarray(RNG.normal(size=(bw, tokens, c)).astype(np.float32))
    params = _params(c)
    ls = jnp.asarray(1.0 + 0.1 * RNG.normal(size=(c,)).astype(np.float32))
    lb = jnp.asarray(0.1 * RNG.normal(size=(c,)).astype(np.float32))
    pos = jnp.asarray(RNG.normal(size=(tokens, c)).astype(np.float32))
    scale = jnp.asarray(
        (RNG.random(bw) > 0.3).astype(np.float32) / 0.7)

    ref = _reference_attention_ln_res(x, *params, ls, lb, pos, None, scale,
                                      num_heads=heads)
    got = fused_attention_ln_res(x, *params, ls, lb, pos, None, scale, 0,
                                 heads, 0.0, 4, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)

    def loss_fused(x, *pt):
        return jnp.sum(fused_attention_ln_res(
            x, *pt[:8], pt[8], pt[9], pos, None, scale, 0, heads,
            0.0, 4, True) ** 2)

    def loss_ref(x, *pt):
        return jnp.sum(_reference_attention_ln_res(
            x, *pt[:8], pt[8], pt[9], pos, None, scale,
            num_heads=heads) ** 2)

    args = (x,) + params + (ls, lb)
    gf = jax.grad(loss_fused, argnums=tuple(range(11)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(11)))(*args)
    names = ["x", "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo", "ls", "lb"]
    for name, a, b in zip(names, gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3, err_msg=name)


def test_fused_ln_res_dropout_and_no_scale():
    from vptr_tpu.ops.fused_window_attention import (
        _reference_attention_ln_res,
        fused_attention_ln_res,
    )

    bw, tokens, c, heads, rate, seed = 6, 16, 32, 4, 0.3, 55
    x = jnp.asarray(RNG.normal(size=(bw, tokens, c)).astype(np.float32))
    params = _params(c)
    ls = jnp.ones((c,), jnp.float32)
    lb = jnp.zeros((c,), jnp.float32)
    keep = dropout_keep_mask(seed, bw, heads, tokens, rate)
    got = fused_attention_ln_res(x, *params, ls, lb, None, None, None, seed,
                                 heads, rate, 4, True)
    ref = _reference_attention_ln_res(x, *params, ls, lb, None, None, None,
                                      num_heads=heads, keep=keep, rate=rate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_mha_residual_fold_matches_unfolded():
    """MultiHeadAttention(residual=True) == x + scale * MHA(ln-folded) on
    both the fused kernel path and the XLA fallback."""
    dim, heads, L, B = 32, 4, 16, 6
    x = jnp.asarray(RNG.normal(size=(B, L, dim)).astype(np.float32))
    pos = jnp.asarray(RNG.normal(size=(L, dim)).astype(np.float32))
    ls = jnp.asarray(1.0 + 0.1 * RNG.normal(size=(dim,)).astype(np.float32))
    lb = jnp.asarray(0.1 * RNG.normal(size=(dim,)).astype(np.float32))
    scale = jnp.asarray((RNG.random(B) > 0.3).astype(np.float32) / 0.7)

    plain = MultiHeadAttention(dim, heads, fused=False)
    params = plain.init(jax.random.PRNGKey(0), x, x, x)
    branch = plain.apply(params, x, x, x, ln=(ls, lb), qk_pos=pos)
    want = x + scale[:, None, None] * branch

    for fused, full in [(False, False), (True, True)]:
        mod = MultiHeadAttention(dim, heads, fused=fused, fused_full=full,
                                 fused_block=8)
        got = mod.apply(params, x, x, x, ln=(ls, lb), qk_pos=pos,
                        residual=True, branch_scale=scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4,
                                   err_msg=f"fused={fused}")


def test_encoder_block_fused_residual_matches_default():
    """EncoderBlock(fused_residual=True) == the default fused block in
    deterministic mode (the fold is exact); in train mode it runs and
    differs only through the DropPath rng stream."""
    from vptr_tpu.models.transformer import EncoderBlock

    dim, heads = 32, 4
    x = jnp.asarray(RNG.normal(size=(2, 5, 8, 8, dim)).astype(np.float32))
    pos2d = jnp.asarray(RNG.normal(size=(4, 4, dim)).astype(np.float32))
    pos_t = jnp.asarray(RNG.normal(size=(5, dim)).astype(np.float32))

    kw = dict(dim=dim, num_heads=heads, window=4, dropout=0.1,
              drop_path=0.1, dim_feedforward=2 * dim, far=True,
              fused_attention=True, fused_full=True)
    b0 = EncoderBlock(**kw)
    b1 = EncoderBlock(fused_residual=True, **kw)
    params = b0.init({"params": jax.random.PRNGKey(0)}, x, pos2d, pos_t)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(
                b1.init({"params": jax.random.PRNGKey(0)}, x, pos2d, pos_t)))

    y0 = b0.apply(params, x, pos2d, pos_t)
    y1 = b1.apply(params, x, pos2d, pos_t)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=1e-5, rtol=1e-5)

    y_tr = b1.apply(params, x, pos2d, pos_t, True, False,
                    rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.all(np.isfinite(np.asarray(y_tr)))
