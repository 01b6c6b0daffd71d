"""Pallas attention-core kernel: dropout(softmax(q k^T * scale + bias)) v for
short token sequences, without materializing logits in HBM.

Why: XLA tiles the trailing two dims of every tensor to (8, 128) sublanes x
lanes. Attention logits over T in {16, 19, 20} tokens therefore pad 6-8x —
measured 8.5x expansion, 192 MB for a (32, 64, 8, 19, 19) f32 logits tensor —
and that padding is real HBM traffic on every forward and backward. This
kernel keeps logits/weights in VMEM; only q, k, v and the output touch HBM.

Attention-weight dropout (the reference applies it post-softmax,
MultiHeadAttentionRPE.py:318-321) runs INSIDE the kernel via a counter-based
hash PRNG: each weight's keep decision is a pure function of
(seed, batch, head, row, col), so the backward kernel regenerates the exact
forward mask with zero HBM traffic and no saved state. A plain-jnp twin of
the generator (:func:`dropout_keep_mask`) exists for test oracles. The
hash is a murmur3-style finalizer — integer vector ops only, so it runs
identically on real TPUs and in interpret mode (pltpu.prng_random_bits is
unavailable off-TPU).

Projections stay in XLA (full-width GEMMs are already at roofline there).
Grid = (batch tiles, heads): the head axis indexes per-head q/k/v blocks, so
no in-kernel reshapes cross the 66-wide head boundary (Mosaic cannot lower
those shape casts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GOLDEN = 0x9E3779B9        # 2^32 / golden ratio
_MIX1 = 0x7FEB352D          # murmur3-variant finalizer constants
_MIX2 = 0x846CA68B

# Mosaic's default scoped-VMEM budget is 16 MB; large-token grid cells
# (e.g. TSLMA's 160-token windows: logits tile (64, 160, 128-padded) f32)
# blow past it and the compile helper aborts (presents as an opaque HTTP
# 500 from the relay — same failure class as round 3's padded-token
# backward, scripts/tpu_bisect_r03.py). Request 64 MB like the
# fused_window_attention kernels, and additionally shrink the batch tile
# until the working-set estimate fits (measured: (64, 160x32) fails at the
# default budget, passes at 64 MB; (64, 160x160) needs the tile shrink).
_VMEM_LIMIT = 64 * 1024 * 1024
_VMEM_TARGET = 40 * 1024 * 1024   # leave room for pipeline double-buffering


def _fit_block(block_b: int, b: int, lq: int, lk: int, d: int,
               bwd: bool) -> int:
    """Largest batch tile <= block_b whose per-cell VMEM estimate fits."""
    lkp = -(-lk // 128) * 128          # lane-padded logits width
    dp = -(-d // 128) * 128
    n_logits = 4 if bwd else 2         # logits+weights (+dw+dl in backward)
    per_row = (n_logits * lq * lkp + (2 * lq + 2 * lk) * dp) * 4
    tb = min(block_b, b)
    while tb > 8 and tb * per_row > _VMEM_TARGET:
        tb //= 2
    return tb


def _hash_uniform(idx: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Counter-based uniform(0,1) from a uint32 element index + seed.

    murmur3-style avalanche; uses the top 24 bits for the float mantissa.
    Pure uint32 vector arithmetic — identical on TPU, CPU, and in interpret
    mode, and cheap enough to recompute in the backward pass.
    """
    x = idx + seed * jnp.uint32(_GOLDEN)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(_MIX1)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(_MIX2)
    x = x ^ (x >> 16)
    # top-24-bit mantissa; via int32 (lossless, < 2^24) because Mosaic has
    # no uint32 -> f32 cast
    return (x >> 8).astype(jnp.int32).astype(jnp.float32) \
        * jnp.float32(1.0 / (1 << 24))


def _keep_mask(seed, batch_start, head, tb: int, tq: int, tk: int,
               num_heads: int, rate: float) -> jnp.ndarray:
    """(TB, Tq, Tk) boolean keep mask for one (batch-tile, head) grid cell.

    The element index is globally unique over (batch, head, row, col), so
    forward and backward grids enumerate identical masks regardless of their
    grid-axis order. For square attention (tq == tk) the index stream is
    identical to the original square-only kernel's.
    """
    b = jax.lax.broadcasted_iota(jnp.uint32, (tb, tq, tk), 0) + batch_start
    r = jax.lax.broadcasted_iota(jnp.uint32, (tb, tq, tk), 1)
    c = jax.lax.broadcasted_iota(jnp.uint32, (tb, tq, tk), 2)
    idx = ((b * jnp.uint32(num_heads) + head) * jnp.uint32(tq) + r) \
        * jnp.uint32(tk) + c
    return _hash_uniform(idx, seed) >= jnp.float32(rate)


def dropout_keep_mask(seed, b: int, h: int, t: int, rate: float,
                      tk: int = None):
    """Plain-jnp twin of the in-kernel mask for the full (B, H, T, Tk) tensor
    (``tk`` defaults to ``t`` — square self-attention).

    Test oracle: an XLA reference using this mask must match the kernel's
    forward and backward bit-for-bit (up to dtype rounding).
    """
    tk = t if tk is None else tk
    seed = jnp.asarray(seed).astype(jnp.uint32)
    bi = jax.lax.broadcasted_iota(jnp.uint32, (b, h, t, tk), 0)
    hi = jax.lax.broadcasted_iota(jnp.uint32, (b, h, t, tk), 1)
    r = jax.lax.broadcasted_iota(jnp.uint32, (b, h, t, tk), 2)
    c = jax.lax.broadcasted_iota(jnp.uint32, (b, h, t, tk), 3)
    idx = ((bi * jnp.uint32(h) + hi) * jnp.uint32(t) + r) * jnp.uint32(tk) + c
    return _hash_uniform(idx, seed) >= jnp.float32(rate)


def _reference_core(q, k, v, bias, keep=None, rate: float = 0.0):
    """q: (B, H, Tq, D); k/v: (B, H, Tk, D); bias: (H, Tq, Tk) or None;
    keep: (B, H, Tq, Tk) bool. Softmax in f32."""
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * (d ** -0.5), k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias[None].astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1)
    if keep is not None and rate > 0.0:
        weights = jnp.where(keep, weights / (1.0 - rate), 0.0)
    weights = weights.astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *,
            use_bias: bool, rate: float, num_heads: int):
    i = pl.program_id(0)                 # batch tile
    j = pl.program_id(1)                 # head
    q = q_ref[:, 0]                      # (TB, Tq, D)
    k = k_ref[:, 0]                      # (TB, Tk, D)
    v = v_ref[:, 0]
    tb, tq, d = q.shape
    tk = k.shape[1]
    scale = d ** -0.5
    logits = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (TB, Tq, Tk)
    if use_bias:
        logits = logits + bias_ref[:].astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1)
    if rate > 0.0:
        keep = _keep_mask(seed_ref[0].astype(jnp.uint32),
                          jnp.uint32(i * tb), jnp.uint32(j),
                          tb, tq, tk, num_heads, rate)
        weights = jnp.where(keep, weights / (1.0 - rate), 0.0)
    weights = weights.astype(q.dtype)
    out = jax.lax.dot_general(
        weights, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(q.dtype)
    o_ref[:, 0] = out


def _core_forward(q, k, v, bias, seed, rate: float, block_b: int,
                  interpret: bool):
    b, h, tq, d = q.shape
    tk = k.shape[2]
    use_bias = bias is not None
    if bias is None:
        bias = jnp.zeros((h, tq, tk), jnp.float32)
    elif bias.shape[0] == 1 and h > 1:
        bias = jnp.broadcast_to(bias, (h, tq, tk))
    bias = bias.astype(jnp.float32)
    seed = jnp.asarray(seed).astype(jnp.int32).reshape(1)

    tb = _fit_block(block_b, b, tq, tk, d, bwd=False)
    pad = (-b) % tb
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad, h, tq, d), q.dtype)], axis=0)
        kz = jnp.zeros((pad, h, tk, d), q.dtype)
        k = jnp.concatenate([k, kz], axis=0)
        v = jnp.concatenate([v, kz], axis=0)
    grid = (q.shape[0] // tb, h)

    seq = lambda t: pl.BlockSpec((tb, 1, t, d), lambda i, j: (i, j, 0, 0),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, use_bias=use_bias, rate=rate,
                          num_heads=h),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  seq(tq), seq(tk), seq(tk),
                  pl.BlockSpec((1, tq, tk), lambda i, j: (j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=seq(tq),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(seed, q, k, v, bias)
    return out[:b] if pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def attention_core(q, k, v, bias, seed=0, dropout_rate: float = 0.0,
                   block_b: int = 128, interpret: bool = False):
    """Fused softmax attention, q: (B, H, Tq, D), k/v: (B, H, Tk, D), with
    Tq/Tk small. Rectangular (Tq != Tk) shapes are first-class — NAR enc-dec
    attention (Tf queries over Tp memory, reference:
    VidHRFormer_modules.py:194-206) and TSLMA at Tp != Tf route here instead
    of falling back to XLA's ~8x-padded (Tq, Tk) logits.

    ``bias``: optional (H | 1, Tq, Tk) additive logit bias (RPE and/or causal
    mask as -1e30). ``seed``: int32 scalar (array or python int) driving the
    in-kernel attention-weight dropout when ``dropout_rate > 0``. Fully
    differentiable; the backward Pallas kernel recomputes softmax and the
    dropout mask from the same seed.
    """
    return _core_forward(q, k, v, bias, seed, dropout_rate, block_b,
                         interpret)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, g_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, *, use_bias: bool,
                rate: float, num_heads: int):
    """Recompute-and-differentiate backward for one (head, batch-tile) cell.

    Grid is (heads, batch_tiles) — heads OUTER so each head's dbias block is
    revisited on consecutive grid steps (accumulation-safe)."""
    j = pl.program_id(0)                 # head
    i = pl.program_id(1)                 # batch tile index
    q = q_ref[:, 0]                      # (TB, Tq, D)
    k = k_ref[:, 0]                      # (TB, Tk, D)
    v = v_ref[:, 0]
    g = g_ref[:, 0]                      # (TB, Tq, D)
    tb, tq, d = q.shape
    tk = k.shape[1]
    scale = d ** -0.5

    logits = jax.lax.dot_general(
        q * scale, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (TB, Tq, Tk)
    if use_bias:
        logits = logits + bias_ref[:].astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1)              # f32, pre-dropout
    if rate > 0.0:
        keep = _keep_mask(seed_ref[0].astype(jnp.uint32),
                          jnp.uint32(i * tb), jnp.uint32(j),
                          tb, tq, tk, num_heads, rate)
        w_drop = jnp.where(keep, w / (1.0 - rate), 0.0)
    else:
        w_drop = w

    gf = g.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    # dv = w_drop^T g
    dv = jax.lax.dot_general(
        w_drop, gf,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))))  # (TB, Tk, D)
    # d(w_drop) = g v^T ; dropout backward maps it to dw
    dw = jax.lax.dot_general(
        gf, vf,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))))  # (TB, Tq, Tk)
    if rate > 0.0:
        dw = jnp.where(keep, dw / (1.0 - rate), 0.0)
    # softmax backward (on the PRE-dropout weights)
    dl = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))      # (TB, Tq, Tk)
    # dq = (dl k) * scale ; dk = (dl^T q) * scale
    dq = jax.lax.dot_general(
        dl, k.astype(jnp.float32),
        dimension_numbers=(((2,), (1,)), ((0,), (0,)))) * scale
    dk = jax.lax.dot_general(
        dl, (q * scale).astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))))

    dq_ref[:, 0] = dq.astype(dq_ref.dtype)
    dk_ref[:, 0] = dk.astype(dk_ref.dtype)
    dv_ref[:, 0] = dv.astype(dv_ref.dtype)
    if use_bias:
        dsum = jnp.sum(dl, axis=0)                   # (Tq, Tk)

        @pl.when(i == 0)
        def _():
            dbias_ref[0] = dsum

        @pl.when(i > 0)
        def _():
            dbias_ref[0] = dbias_ref[0] + dsum
    else:
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])


def _core_backward(q, k, v, bias, seed, g, rate: float, block_b: int,
                   interpret: bool):
    b, h, tq, d = q.shape
    tk = k.shape[2]
    use_bias = bias is not None
    bias_in = (jnp.broadcast_to(bias.astype(jnp.float32), (h, tq, tk))
               if use_bias else jnp.zeros((h, tq, tk), jnp.float32))
    seed_in = jnp.asarray(seed).astype(jnp.int32).reshape(1)

    tb = _fit_block(block_b, b, tq, tk, d, bwd=True)
    pad = (-b) % tb
    if pad:
        kz = jnp.zeros((pad, h, tk, d), q.dtype)
        q = jnp.concatenate([q, jnp.zeros((pad, h, tq, d), q.dtype)], axis=0)
        k = jnp.concatenate([k, kz], axis=0)
        v = jnp.concatenate([v, kz], axis=0)
        g = jnp.concatenate([g, jnp.zeros((pad, h, tq, d), g.dtype)], axis=0)
    grid = (h, q.shape[0] // tb)         # heads outer (see kernel docstring)

    seq = lambda t: pl.BlockSpec((tb, 1, t, d), lambda j, i: (i, j, 0, 0),
                                 memory_space=pltpu.VMEM)
    head_bias = lambda: pl.BlockSpec((1, tq, tk), lambda j, i: (j, 0, 0),
                                     memory_space=pltpu.VMEM)
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, use_bias=use_bias, rate=rate,
                          num_heads=h),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct((h, tq, tk), jnp.float32)),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  seq(tq), seq(tk), seq(tk), head_bias(), seq(tq)],
        out_specs=(seq(tq), seq(tk), seq(tk), head_bias()),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(seed_in, q, k, v, bias_in, g)
    if pad:
        dq, dk, dv = dq[:b], dk[:b], dv[:b]
    if not use_bias:
        dbias_out = None
    elif bias.shape[0] == 1:
        dbias_out = jnp.sum(dbias, axis=0, keepdims=True).astype(bias.dtype)
    else:
        dbias_out = dbias.astype(bias.dtype)
    return dq, dk, dv, dbias_out


def _fwd(q, k, v, bias, seed, rate, block_b, interpret):
    out = _core_forward(q, k, v, bias, seed, rate, block_b, interpret)
    return out, (q, k, v, bias, seed)


def _bwd(rate, block_b, interpret, residuals, g):
    q, k, v, bias, seed = residuals
    dq, dk, dv, dbias = _core_backward(q, k, v, bias, seed, g, rate,
                                       block_b, interpret)
    dseed = np.zeros(jnp.shape(seed), jax.dtypes.float0)
    return dq, dk, dv, dbias, dseed


attention_core.defvjp(_fwd, _bwd)
