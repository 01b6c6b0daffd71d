"""Pallas fused LayerNorm + linear feed-forward (the block's Mlp sublayer).

Covers ``norm4`` + ``Mlp``: per-token LayerNorm, fc1 GEMM (C -> H), exact
GELU, hidden dropout, fc2 GEMM (H -> C) — one kernel per direction over 2D
row tiles. The XLA path materializes the norm output, the 4x-wide hidden
pre- and post-GELU, and the dropout mask to HBM each direction (~3 hidden-
width round-trips at 51 MB each for the parity geometry); here everything
between x and the sublayer output stays in VMEM. The residual add and the
block's outer drop3 stay in XLA (they fuse with neighbors there).

Unlike the measured-and-rejected conv-FFN kernel (ops/fused_conv_ln.py,
whole-sample LayerNormHWC stats forced per-sample GEMM granularity), this
norm is per-token: stats reduce over the lane axis inside each row tile, so
the GEMMs run at full tile width.

Semantics (reference: VidHRFormer_modules.py:50-55,88-90 —
``linear2(drop2(gelu(linear1(norm4(x)))))``):
    xn = LayerNorm(x) * ls + lb          # f32 stats, cast to compute dtype
    h  = gelu(xn @ w1 + b1)              # exact-erf GELU (A&S rational form:
                                         # Mosaic has no erf lowering)
    hd = dropout(h)                      # counter-based hash PRNG, same
                                         # forward/backward regeneration
                                         # scheme as the attention kernels
    y  = hd @ w2 + b2

Backward recomputes the forward in VMEM and accumulates weight/bias/affine
grads across the row grid (single grid axis: += is race-free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vptr_tpu.ops.attention_core import _hash_uniform
from vptr_tpu.ops.fused_conv_ln import _gelu, _gelu_grad
from vptr_tpu.ops.fused_window_attention import _ln_rows

_VMEM_LIMIT = 64 * 1024 * 1024


def _keep_rows(seed, row0, rows: int, cols: int, rate: float):
    """(rows, cols) keep mask; element index = global_row * cols + col."""
    r = jax.lax.broadcasted_iota(jnp.uint32, (rows, cols), 0) + row0
    c = jax.lax.broadcasted_iota(jnp.uint32, (rows, cols), 1)
    return _hash_uniform(r * jnp.uint32(cols) + c, seed) >= jnp.float32(rate)


def ffn_keep_mask(seed, rows: int, cols: int, rate: float):
    """jnp twin of the in-kernel hidden-dropout mask (test oracle)."""
    seed = jnp.asarray(seed).astype(jnp.uint32)
    return _keep_rows(seed, jnp.uint32(0), rows, cols, rate)


def _reference_ffn(x, w1, b1, w2, b2, ls, lb, keep=None, rate: float = 0.0):
    """Plain-XLA oracle with identical semantics. x: (S, C)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    xn = ((x32 - mean) * jax.lax.rsqrt(var + 1e-5) * ls + lb).astype(x.dtype)
    h = jnp.dot(xn, w1, preferred_element_type=jnp.float32) \
        + b1.astype(jnp.float32)
    h = _gelu(h)
    if keep is not None and rate > 0.0:
        h = jnp.where(keep, h / (1.0 - rate), 0.0)
    h = h.astype(x.dtype)
    y = jnp.dot(h, w2, preferred_element_type=jnp.float32) \
        + b2.astype(jnp.float32)
    return y.astype(x.dtype)


def _fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls_ref,
                lb_ref, o_ref, *, rate: float):
    i = pl.program_id(0)
    rows = x_ref.shape[0]
    x2 = x_ref[:].astype(jnp.float32)
    xn32, _, _ = _ln_rows(x2, ls_ref[:], lb_ref[:])
    xn = xn32.astype(x_ref.dtype)
    h = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32) \
        + b1_ref[:].astype(jnp.float32)
    h = _gelu(h)
    if rate > 0.0:
        keep = _keep_rows(seed_ref[0].astype(jnp.uint32),
                          jnp.uint32(i * rows), rows, h.shape[1], rate)
        h = jnp.where(keep, h / (1.0 - rate), 0.0)
    h = h.astype(x_ref.dtype)
    y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) \
        + b2_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls_ref,
                lb_ref, g_ref, dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                dls_ref, dlb_ref, *, rate: float):
    i = pl.program_id(0)
    rows = x_ref.shape[0]
    x2 = x_ref[:].astype(jnp.float32)
    g2 = g_ref[:].astype(jnp.float32)
    xn32, xhat, rstd = _ln_rows(x2, ls_ref[:], lb_ref[:])
    xn = xn32.astype(x_ref.dtype)
    a = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32) \
        + b1_ref[:].astype(jnp.float32)
    h = _gelu(a)
    if rate > 0.0:
        keep = _keep_rows(seed_ref[0].astype(jnp.uint32),
                          jnp.uint32(i * rows), rows, h.shape[1], rate)
        hd = jnp.where(keep, h / (1.0 - rate), 0.0)
    else:
        hd = h

    # dW2 / db2 from the (recomputed) dropped hidden
    dw2 = jax.lax.dot_general(hd, g2, (((0,), (0,)), ((), ())))
    db2 = jnp.sum(g2, axis=0)
    dhd = jax.lax.dot_general(g2, w2_ref[:].astype(jnp.float32),
                              (((1,), (1,)), ((), ())))
    if rate > 0.0:
        dh = jnp.where(keep, dhd / (1.0 - rate), 0.0)
    else:
        dh = dhd
    da = dh * _gelu_grad(a)
    dw1 = jax.lax.dot_general(xn.astype(jnp.float32), da,
                              (((0,), (0,)), ((), ())))
    db1 = jnp.sum(da, axis=0)
    dxn = jax.lax.dot_general(da, w1_ref[:].astype(jnp.float32),
                              (((1,), (1,)), ((), ())))

    dls = jnp.sum(dxn * xhat, axis=0)
    dlb = jnp.sum(dxn, axis=0)
    dxhat = dxn * ls_ref[:]
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    dx_ref[:] = ((dxhat - m1 - xhat * m2) * rstd).astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dw1_ref[:] = dw1
        db1_ref[:] = db1
        dw2_ref[:] = dw2
        db2_ref[:] = db2
        dls_ref[:] = dls
        dlb_ref[:] = dlb

    @pl.when(i > 0)
    def _():
        dw1_ref[:] = dw1_ref[:] + dw1
        db1_ref[:] = db1_ref[:] + db1
        dw2_ref[:] = dw2_ref[:] + dw2
        db2_ref[:] = db2_ref[:] + db2
        dls_ref[:] = dls_ref[:] + dls
        dlb_ref[:] = dlb_ref[:] + dlb


def _pad_rows(z, blk):
    pad = (-z.shape[0]) % blk
    if pad:
        z = jnp.concatenate(
            [z, jnp.zeros((pad,) + z.shape[1:], z.dtype)], axis=0)
    return z


def _specs(cin, hidden, cout, rows):
    tile_in = pl.BlockSpec((rows, cin), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    tile_out = pl.BlockSpec((rows, cout), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    m1 = pl.BlockSpec((cin, hidden), lambda i: (0, 0),
                      memory_space=pltpu.VMEM)
    m2 = pl.BlockSpec((hidden, cout), lambda i: (0, 0),
                      memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((n,), lambda i: (0,),
                                 memory_space=pltpu.VMEM)
    return tile_in, tile_out, m1, m2, vec


def _forward(x, w1, b1, w2, b2, ls, lb, seed, rate: float, block_rows: int,
             interpret: bool):
    s, cin = x.shape
    hidden, cout = w1.shape[1], w2.shape[1]
    rows = min(block_rows, s)
    xp = _pad_rows(x, rows)
    seed = jnp.asarray(seed).astype(jnp.int32).reshape(1)
    tile_in, tile_out, m1, m2, vec = _specs(cin, hidden, cout, rows)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], cout), x.dtype),
        grid=(xp.shape[0] // rows,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  tile_in, m1, vec(hidden), m2, vec(cout),
                  vec(cin), vec(cin)],
        out_specs=tile_out,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(seed, xp, w1, b1, w2, b2,
      ls.astype(jnp.float32), lb.astype(jnp.float32))
    return out[:s]


def _backward(x, w1, b1, w2, b2, ls, lb, seed, g, rate: float,
              block_rows: int, interpret: bool):
    s, cin = x.shape
    hidden, cout = w1.shape[1], w2.shape[1]
    rows = min(block_rows, s)
    xp = _pad_rows(x, rows)
    gp = _pad_rows(g, rows)
    seed = jnp.asarray(seed).astype(jnp.int32).reshape(1)
    tile_in, tile_out, m1, m2, vec = _specs(cin, hidden, cout, rows)
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate),
        out_shape=(
            jax.ShapeDtypeStruct(xp.shape, x.dtype),       # dx
            jax.ShapeDtypeStruct((cin, hidden), f32),      # dw1
            jax.ShapeDtypeStruct((hidden,), f32),          # db1
            jax.ShapeDtypeStruct((hidden, cout), f32),     # dw2
            jax.ShapeDtypeStruct((cout,), f32),            # db2
            jax.ShapeDtypeStruct((cin,), f32),             # dls
            jax.ShapeDtypeStruct((cin,), f32),             # dlb
        ),
        grid=(xp.shape[0] // rows,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  tile_in, m1, vec(hidden), m2, vec(cout),
                  vec(cin), vec(cin), tile_out],
        out_specs=(tile_in, m1, vec(hidden), m2, vec(cout),
                   vec(cin), vec(cin)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(seed, xp, w1, b1, w2, b2,
      ls.astype(f32), lb.astype(f32), gp)
    dx = outs[0][:s]
    dw1, db1, dw2, db2, dls, dlb = outs[1:]
    cast = lambda grad, ref: grad.astype(ref.dtype)
    return (dx, cast(dw1, w1), cast(db1, b1), cast(dw2, w2), cast(db2, b2),
            cast(dls, ls), cast(dlb, lb))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_ffn(x, w1, b1, w2, b2, ls, lb, seed=0, rate: float = 0.0,
              block_rows: int = 256, interpret: bool = False,
              block_rows_bwd: int = 128):
    """Fused norm4+Mlp sublayer over (S, C) rows; see module docstring.

    ``ls``/``lb``: the LayerNorm affine (C,). ``seed``: int32 scalar for the
    in-kernel hidden dropout when ``rate > 0``. The caller adds the residual
    and the block's outer dropout.
    """
    return _forward(x, w1, b1, w2, b2, ls, lb, seed, rate, block_rows,
                    interpret)


def _fwd(x, w1, b1, w2, b2, ls, lb, seed, rate, block_rows, interpret,
         block_rows_bwd):
    out = _forward(x, w1, b1, w2, b2, ls, lb, seed, rate, block_rows,
                   interpret)
    return out, (x, w1, b1, w2, b2, ls, lb, seed)


def _bwd(rate, block_rows, interpret, block_rows_bwd, residuals, g):
    x, w1, b1, w2, b2, ls, lb, seed = residuals
    grads = _backward(x, w1, b1, w2, b2, ls, lb, seed, g, rate,
                      block_rows_bwd, interpret)
    dseed = np.zeros(jnp.shape(seed), jax.dtypes.float0)
    return grads + (dseed,)


fused_ffn.defvjp(_fwd, _bwd)
