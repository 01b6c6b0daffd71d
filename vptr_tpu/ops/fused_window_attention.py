"""Pallas fully-fused self-attention sublayer for short token sequences.

Fuses the whole attention sublayer body — q/k/v projections, scaled
dot-product attention over a short token axis (win^2 spatial tokens or T
temporal tokens), optional additive bias (relative position bias and/or a
causal mask), attention-weight dropout, and the output projection — into one
kernel per direction, so per-window q/k/v and attention intermediates never
round-trip to HBM. The XLA path materializes ~5 activation-sized tensors per
layer; at (N*T*windows, 16, 528) that is ~64 MB of HBM traffic per layer this
kernel avoids.

Both directions are Pallas kernels. The backward recomputes the forward
(projections + softmax + dropout mask) from the inputs in VMEM and produces
input grads per batch tile plus weight/bias/bias-table grads accumulated
across grid steps (the single grid axis revisits the same weight-grad block
every step, so accumulation is race-free).

Dropout uses the same counter-based hash PRNG as
``vptr_tpu.ops.attention_core`` (`dropout_keep_mask` is the shared jnp test
oracle): the keep decision is a pure function of (seed, batch, head, row,
col), so forward and backward regenerate identical masks from a scalar seed.

Semantics match ``vptr_tpu.models.layers.dot_product_attention`` + separate
q/k/v/out Dense layers: softmax in float32, q scaled by head_dim^-0.5,
q/k computed from ``x_qk`` and v from ``x_v`` (they differ in the NAR
decoder's query self-attention, reference: VidHRFormer_modules.py:176-178),
dropout applied to the post-softmax weights (reference:
MultiHeadAttentionRPE.py:318-321).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vptr_tpu.ops.attention_core import _hash_uniform


def _keep_mask_heads_inner(seed, row_start, rows: int, t: int,
                           rate: float) -> jnp.ndarray:
    """(rows, T, T) keep mask where dim 0 enumerates (batch, head) pairs.

    ``row_start`` = global_batch_start * num_heads; the element index matches
    attention_core.dropout_keep_mask's ((b*H + h)*T + r)*T + c convention, so
    that jnp twin doubles as this kernel's test oracle.
    """
    rh = jax.lax.broadcasted_iota(jnp.uint32, (rows, t, t), 0) + row_start
    r = jax.lax.broadcasted_iota(jnp.uint32, (rows, t, t), 1)
    c = jax.lax.broadcasted_iota(jnp.uint32, (rows, t, t), 2)
    idx = (rh * jnp.uint32(t) + r) * jnp.uint32(t) + c
    return _hash_uniform(idx, seed) >= jnp.float32(rate)


def _reference_attention(x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias,
                         num_heads: int, keep=None, rate: float = 0.0):
    """Plain-XLA reference with identical semantics (also the test oracle).

    ``keep``: optional (B, H, T, T) boolean mask from dropout_keep_mask."""
    bw, t, c = x_qk.shape
    hd = c // num_heads
    q = jnp.einsum("btc,cd->btd", x_qk, wq) + bq
    k = jnp.einsum("btc,cd->btd", x_qk, wk) + bk
    v = jnp.einsum("btc,cd->btd", x_v, wv) + bv

    def split(z):  # (B, T, C) -> (B, H, T, D)
        return z.reshape(bw, t, num_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * (hd ** -0.5), k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias[None].astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1)
    if keep is not None and rate > 0.0:
        weights = jnp.where(keep, weights / (1.0 - rate), 0.0)
    weights = weights.astype(x_qk.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
    out = out.transpose(0, 2, 1, 3).reshape(bw, t, c)
    return jnp.einsum("btc,cd->btd", out, wo) + bo


def _recompute_to_weights(xqk, xv, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
                          bv_ref, bias_ref, seed_ref, i, *, num_heads: int,
                          tokens: int, tb: int, use_bias: bool, rate: float):
    """Shared fwd/bwd body: projections -> per-head q/k/v -> softmax ->
    dropout. Returns (qh, kh, vh, w f32 pre-dropout, w_drop compute-dtype,
    keep-or-None)."""
    c = xqk.shape[-1]
    hd = c // num_heads

    def proj(x, w_ref, b_ref):
        y = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
        return (y + b_ref[:].astype(jnp.float32)).astype(x.dtype)

    q = proj(xqk, wq_ref, bq_ref)
    k = proj(xqk, wk_ref, bk_ref)
    v = proj(xv, wv_ref, bv_ref)

    def split(z):  # (TB*T, C) -> (TB*H, T, D) — Mosaic matmul allows only
        # one batch dim, so windows and heads share it
        z = z.reshape(tb, tokens, num_heads, hd).transpose(0, 2, 1, 3)
        return z.reshape(tb * num_heads, tokens, hd)

    qh, kh, vh = split(q), split(k), split(v)
    scale = hd ** -0.5
    logits = jax.lax.dot_general(
        qh * scale, kh,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # (TB*H, T, T)
    if use_bias:
        b = bias_ref[:].astype(jnp.float32)        # (H, T, T)
        logits = (logits.reshape(tb, num_heads, tokens, tokens) + b[None]
                  ).reshape(tb * num_heads, tokens, tokens)
    w = jax.nn.softmax(logits, axis=-1)            # f32
    keep = None
    if rate > 0.0:
        keep = _keep_mask_heads_inner(
            seed_ref[0].astype(jnp.uint32),
            jnp.uint32(i * tb * num_heads), tb * num_heads, tokens, rate)
        w_drop = jnp.where(keep, w / (1.0 - rate), 0.0)
    else:
        w_drop = w
    return qh, kh, vh, w, w_drop.astype(xqk.dtype), keep


def _kernel(seed_ref, xqk_ref, xv_ref, wq_ref, bq_ref, wk_ref, bk_ref,
            wv_ref, bv_ref, wo_ref, bo_ref, bias_ref, o_ref, *,
            num_heads: int, tokens: int, use_bias: bool, rate: float):
    i = pl.program_id(0)
    tb = xqk_ref.shape[0]
    c = xqk_ref.shape[-1]
    hd = c // num_heads
    xqk = xqk_ref[:].reshape(tb * tokens, c)
    xv = xv_ref[:].reshape(tb * tokens, c)

    _, _, vh, _, w_drop, _ = _recompute_to_weights(
        xqk, xv, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, bias_ref,
        seed_ref, i, num_heads=num_heads, tokens=tokens, tb=tb,
        use_bias=use_bias, rate=rate)

    out = jax.lax.dot_general(
        w_drop, vh,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(xqk.dtype)  # (TB*H,T,D)
    out = out.reshape(tb, num_heads, tokens, hd).transpose(0, 2, 1, 3)
    out = out.reshape(tb * tokens, c)
    y = jnp.dot(out, wo_ref[:], preferred_element_type=jnp.float32)
    y = (y + bo_ref[:].astype(jnp.float32)).astype(xqk.dtype)
    o_ref[:] = y.reshape(tb, tokens, c)


def _prep(bias, num_heads, tokens, seed):
    use_bias = bias is not None
    if bias is None:
        bias = jnp.zeros((num_heads, tokens, tokens), jnp.float32)
    if bias.shape[0] == 1 and num_heads > 1:
        bias = jnp.broadcast_to(bias, (num_heads, tokens, tokens))
    bias = bias.astype(jnp.float32)
    seed = jnp.asarray(seed).astype(jnp.int32).reshape(1)
    return bias, use_bias, seed


def _fused_forward(x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias, seed,
                   num_heads: int, rate: float, block_windows: int,
                   interpret: bool):
    bw, tokens, c = x_qk.shape
    bias, use_bias, seed = _prep(bias, num_heads, tokens, seed)

    tb = min(block_windows, bw)
    pad = (-bw) % tb
    if pad:
        zeros = jnp.zeros((pad, tokens, c), x_qk.dtype)
        x_qk = jnp.concatenate([x_qk, zeros], axis=0)
        x_v = jnp.concatenate([x_v, zeros], axis=0)
    grid = (x_qk.shape[0] // tb,)

    mat = lambda: pl.BlockSpec((c, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    vec = lambda: pl.BlockSpec((c,), lambda i: (0,),
                               memory_space=pltpu.VMEM)
    seq = lambda: pl.BlockSpec((tb, tokens, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, tokens=tokens,
                          use_bias=use_bias, rate=rate),
        out_shape=jax.ShapeDtypeStruct(x_qk.shape, x_qk.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            seq(), seq(),
            mat(), vec(), mat(), vec(), mat(), vec(), mat(), vec(),
            pl.BlockSpec((num_heads, tokens, tokens), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=seq(),
        interpret=interpret,
    )(seed, x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias)
    return out[:bw] if pad else out


def _bwd_kernel(seed_ref, xqk_ref, xv_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                wv_ref, bv_ref, wo_ref, bo_ref, bias_ref, g_ref,
                dxqk_ref, dxv_ref, dwq_ref, dbq_ref, dwk_ref, dbk_ref,
                dwv_ref, dbv_ref, dwo_ref, dbo_ref, dbias_ref, *,
                num_heads: int, tokens: int, use_bias: bool, rate: float):
    """Fully-fused backward: recompute forward in VMEM, emit per-tile input
    grads and grid-accumulated weight/bias grads (single grid axis revisits
    every weight-grad block, so += is race-free)."""
    i = pl.program_id(0)
    tb = xqk_ref.shape[0]
    c = xqk_ref.shape[-1]
    hd = c // num_heads
    xqk = xqk_ref[:].reshape(tb * tokens, c)
    xv = xv_ref[:].reshape(tb * tokens, c)
    g = g_ref[:].reshape(tb * tokens, c).astype(jnp.float32)

    qh, kh, vh, w, w_drop, keep = _recompute_to_weights(
        xqk, xv, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, bias_ref,
        seed_ref, i, num_heads=num_heads, tokens=tokens, tb=tb,
        use_bias=use_bias, rate=rate)
    scale = hd ** -0.5

    def split(z):  # (TB*T, C) -> (TB*H, T, D)
        z = z.reshape(tb, tokens, num_heads, hd).transpose(0, 2, 1, 3)
        return z.reshape(tb * num_heads, tokens, hd)

    def merge(z):  # (TB*H, T, D) -> (TB*T, C)
        z = z.reshape(tb, num_heads, tokens, hd).transpose(0, 2, 1, 3)
        return z.reshape(tb * tokens, c)

    # ---- out projection ----
    ao = merge(jax.lax.dot_general(            # attn output pre-out-proj
        w_drop, vh,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(xqk.dtype))
    dwo = jnp.dot(ao.astype(jnp.float32).T, g,
                  preferred_element_type=jnp.float32)            # (C, C)
    dbo = jnp.sum(g, axis=0)                                      # (C,)
    dao = jnp.dot(g, wo_ref[:].astype(jnp.float32).T,
                  preferred_element_type=jnp.float32)            # (TB*T, C)
    dao_h = split(dao.astype(xqk.dtype)).astype(jnp.float32)     # (TB*H,T,D)

    # ---- attention ----
    vf = vh.astype(jnp.float32)
    dv_h = jax.lax.dot_general(                 # w_drop^T dao
        w_drop.astype(jnp.float32), dao_h,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))))          # (TB*H,T,D)
    dwd = jax.lax.dot_general(                  # dao v^T
        dao_h, vf,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))))          # (TB*H,T,T)
    if rate > 0.0:
        dw = jnp.where(keep, dwd / (1.0 - rate), 0.0)
    else:
        dw = dwd
    # softmax backward on the PRE-dropout weights
    dl = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))      # (TB*H,T,T)
    dq_h = jax.lax.dot_general(
        dl, kh.astype(jnp.float32),
        dimension_numbers=(((2,), (1,)), ((0,), (0,)))) * scale
    dk_h = jax.lax.dot_general(
        dl, (qh * scale).astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))))

    # ---- projections ----
    dq = merge(dq_h.astype(xqk.dtype)).astype(jnp.float32)       # (TB*T, C)
    dk = merge(dk_h.astype(xqk.dtype)).astype(jnp.float32)
    dv = merge(dv_h.astype(xqk.dtype)).astype(jnp.float32)
    xqk_f = xqk.astype(jnp.float32)
    xv_f = xv.astype(jnp.float32)
    dwq = jnp.dot(xqk_f.T, dq, preferred_element_type=jnp.float32)
    dwk = jnp.dot(xqk_f.T, dk, preferred_element_type=jnp.float32)
    dwv = jnp.dot(xv_f.T, dv, preferred_element_type=jnp.float32)
    dbq = jnp.sum(dq, axis=0)
    dbk = jnp.sum(dk, axis=0)
    dbv = jnp.sum(dv, axis=0)
    dxqk = (jnp.dot(dq, wq_ref[:].astype(jnp.float32).T)
            + jnp.dot(dk, wk_ref[:].astype(jnp.float32).T))
    dxv = jnp.dot(dv, wv_ref[:].astype(jnp.float32).T)

    dxqk_ref[:] = dxqk.astype(dxqk_ref.dtype).reshape(tb, tokens, c)
    dxv_ref[:] = dxv.astype(dxv_ref.dtype).reshape(tb, tokens, c)

    dsum = jnp.sum(dl.reshape(tb, num_heads, tokens, tokens), axis=0)

    @pl.when(i == 0)
    def _():
        dwq_ref[:] = dwq
        dbq_ref[:] = dbq
        dwk_ref[:] = dwk
        dbk_ref[:] = dbk
        dwv_ref[:] = dwv
        dbv_ref[:] = dbv
        dwo_ref[:] = dwo
        dbo_ref[:] = dbo
        dbias_ref[:] = dsum if use_bias else jnp.zeros_like(dbias_ref)

    @pl.when(i > 0)
    def _():
        dwq_ref[:] = dwq_ref[:] + dwq
        dbq_ref[:] = dbq_ref[:] + dbq
        dwk_ref[:] = dwk_ref[:] + dwk
        dbk_ref[:] = dbk_ref[:] + dbk
        dwv_ref[:] = dwv_ref[:] + dwv
        dbv_ref[:] = dbv_ref[:] + dbv
        dwo_ref[:] = dwo_ref[:] + dwo
        dbo_ref[:] = dbo_ref[:] + dbo
        if use_bias:
            dbias_ref[:] = dbias_ref[:] + dsum


def _fused_backward(x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias, seed, g,
                    num_heads: int, rate: float, block_windows: int,
                    interpret: bool):
    bw, tokens, c = x_qk.shape
    bias_in, use_bias, seed_in = _prep(bias, num_heads, tokens, seed)

    tb = min(block_windows, bw)
    pad = (-bw) % tb
    if pad:
        zeros = jnp.zeros((pad, tokens, c), x_qk.dtype)
        x_qk = jnp.concatenate([x_qk, zeros], axis=0)
        x_v = jnp.concatenate([x_v, zeros], axis=0)
        g = jnp.concatenate([g, jnp.zeros((pad, tokens, c), g.dtype)], axis=0)
    grid = (x_qk.shape[0] // tb,)

    mat = lambda: pl.BlockSpec((c, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    vec = lambda: pl.BlockSpec((c,), lambda i: (0,),
                               memory_space=pltpu.VMEM)
    seq = lambda: pl.BlockSpec((tb, tokens, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    bias_spec = lambda: pl.BlockSpec((num_heads, tokens, tokens),
                                     lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM)
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=num_heads, tokens=tokens,
                          use_bias=use_bias, rate=rate),
        out_shape=(
            jax.ShapeDtypeStruct(x_qk.shape, x_qk.dtype),   # dx_qk
            jax.ShapeDtypeStruct(x_qk.shape, x_qk.dtype),   # dx_v
            jax.ShapeDtypeStruct((c, c), f32),              # dwq
            jax.ShapeDtypeStruct((c,), f32),                # dbq
            jax.ShapeDtypeStruct((c, c), f32),              # dwk
            jax.ShapeDtypeStruct((c,), f32),                # dbk
            jax.ShapeDtypeStruct((c, c), f32),              # dwv
            jax.ShapeDtypeStruct((c,), f32),                # dbv
            jax.ShapeDtypeStruct((c, c), f32),              # dwo
            jax.ShapeDtypeStruct((c,), f32),                # dbo
            jax.ShapeDtypeStruct((num_heads, tokens, tokens), f32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            seq(), seq(),
            mat(), vec(), mat(), vec(), mat(), vec(), mat(), vec(),
            bias_spec(), seq(),
        ],
        out_specs=(seq(), seq(), mat(), vec(), mat(), vec(), mat(), vec(),
                   mat(), vec(), bias_spec()),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(seed_in, x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias_in, g)
    dxqk, dxv = outs[0], outs[1]
    if pad:
        dxqk, dxv = dxqk[:bw], dxv[:bw]
    dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo, dbias = outs[2:]
    cast = lambda grad, ref: grad.astype(ref.dtype)
    grads = (dxqk, dxv, cast(dwq, wq), cast(dbq, bq), cast(dwk, wk),
             cast(dbk, bk), cast(dwv, wv), cast(dbv, bv), cast(dwo, wo),
             cast(dbo, bo))
    if bias is None:
        dbias_out = None
    elif bias.shape[0] == 1:
        dbias_out = jnp.sum(dbias, axis=0, keepdims=True).astype(bias.dtype)
    else:
        dbias_out = dbias.astype(bias.dtype)
    return grads + (dbias_out,)


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15))
def fused_attention(x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias, seed=0,
                    num_heads: int = 8, dropout_rate: float = 0.0,
                    block_windows: int = 64, interpret: bool = False):
    """Fused short-sequence attention sublayer over (B, tokens, C).

    ``bias``: optional (heads | 1, tokens, tokens) additive logit bias —
    carries the RPE table and/or a causal mask (-1e30 upper triangle).
    ``seed``: int32 scalar for attention-weight dropout when
    ``dropout_rate > 0``. Fully differentiable; the backward is a fused
    Pallas kernel producing input, weight, and bias grads.
    """
    return _fused_forward(x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias,
                          seed, num_heads, dropout_rate, block_windows,
                          interpret)


def _fwd(x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias, seed, num_heads,
         rate, block_windows, interpret):
    out = _fused_forward(x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias,
                         seed, num_heads, rate, block_windows, interpret)
    return out, (x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias, seed)


def _bwd(num_heads, rate, block_windows, interpret, residuals, g):
    x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias, seed = residuals
    grads = _fused_backward(x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias,
                            seed, g, num_heads, rate, block_windows,
                            interpret)
    dseed = np.zeros(jnp.shape(seed), jax.dtypes.float0)
    return grads + (dseed,)


fused_attention.defvjp(_fwd, _bwd)
