"""Pallas fused LayerNormHWC + GELU + depthwise-3x3 + LayerNormHWC + GELU
(+ dropout) — the bandwidth chain between MlpDWBN's two 1x1 GEMMs.

The conv feed-forward (reference: VidHRFormer_modules.py:376-442) runs, at
the 4x-hidden width (2112 channels, 51 MB per activation at the parity
geometry):

    fc1 -> norm1 -> GELU -> dw3x3 -> norm2 -> GELU -> drop -> fc2

The two norms are whole-sample LayerNorms over (H, W, C) — two-pass
reductions XLA cannot fuse into their neighbors, so the XLA path makes ~6
hidden-width HBM round-trips between the GEMMs. This kernel keeps the
chain in VMEM: read fc1's output once, write fc2's input once. The GEMMs
themselves stay in XLA (measured faster there: lane padding sinks Pallas
GEMMs at 528/2112 widths — see ops/fused_ffn.py notes).

Shapes: x (N, HW, C) with HW = H*W a sublane multiple (8x8 latents = 64);
the depthwise conv sees rows as an (H, W) grid (row r = (r // W, r % W))
and is computed with masked sublane rolls — no (H, W) reshape, which
Mosaic could not lower at these widths.

Stats are per sample and SCALAR (static loop over the tile's samples): the
vectorized (S, 1, 1) keepdims form crashes Mosaic layout inference
(ops/fused_conv_ln.py note). Dropout uses the shared counter-based hash
PRNG (`dw_keep_mask` is the jnp oracle).
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

_VMEM_LIMIT = 64 * 1024 * 1024


def _keep_sample(seed, sample_idx, hw: int, c: int, rate: float):
    """(HW, C) keep mask for one sample; element index is global over
    (sample, position, channel)."""
    r = jax.lax.broadcasted_iota(jnp.uint32, (hw, c), 0)
    col = jax.lax.broadcasted_iota(jnp.uint32, (hw, c), 1)
    idx = (sample_idx * jnp.uint32(hw) + r) * jnp.uint32(c) + col
    return _hash_uniform(idx, seed) >= jnp.float32(rate)


def dw_keep_mask(seed, n: int, hw: int, c: int, rate: float):
    """jnp twin of the in-kernel dropout mask (test oracle): (N, HW, C)."""
    seed = jnp.asarray(seed).astype(jnp.uint32)
    s = jax.lax.broadcasted_iota(jnp.uint32, (n, hw, c), 0)
    r = jax.lax.broadcasted_iota(jnp.uint32, (n, hw, c), 1)
    col = jax.lax.broadcasted_iota(jnp.uint32, (n, hw, c), 2)
    idx = (s * jnp.uint32(hw) + r) * jnp.uint32(c) + col
    return _hash_uniform(idx, seed) >= jnp.float32(rate)


# ---------------------------------------------------------------------------
# depthwise 3x3 on the (HW, C) row grid via masked sublane rolls
# ---------------------------------------------------------------------------

def _row_masks(hw: int, w: int):
    """Static (HW, 1) masks: rows with/without a left/right neighbor."""
    r = np.arange(hw)
    has_left = (r % w != 0).astype(np.float32)[:, None]
    has_right = (r % w != w - 1).astype(np.float32)[:, None]
    return has_left, has_right


def _row_masks_iota(hw: int, w: int):
    """In-kernel variant of _row_masks (Pallas kernels cannot capture array
    constants — build the masks from iota instead)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0)
    has_left = (r % w != 0).astype(jnp.float32)
    has_right = (r % w != w - 1).astype(jnp.float32)
    return has_left, has_right


def _shift(z, offset: int, hw: int):
    """Roll rows by ``offset`` with zero fill (no wraparound): the value at
    output row r is input row r + offset, or 0 if out of range."""
    if offset == 0:
        return z
    if offset > 0:
        pad = jnp.zeros((offset,) + z.shape[1:], z.dtype)
        return jnp.concatenate([z[offset:], pad], axis=0)
    pad = jnp.zeros((-offset,) + z.shape[1:], z.dtype)
    return jnp.concatenate([pad, z[:offset]], axis=0)


def _dw3x3(z, taps, bias, hw: int, w: int, masks):
    """Depthwise 3x3 with zero ('same') padding on the (H, W) row grid.
    z: (HW, C) f32; taps: (9, C) f32 row-major (dy, dx); bias (C,)."""
    has_left, has_right = masks
    acc = bias.astype(jnp.float32) * jnp.ones_like(z)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            t = taps[(dy + 1) * 3 + (dx + 1)]
            s = _shift(z, dy * w + dx, hw)
            if dx == -1:
                s = s * has_left
            elif dx == 1:
                s = s * has_right
            acc = acc + s * t
    return acc


def _dw3x3_t(dz, taps, hw: int, w: int, masks):
    """Transpose (gradient w.r.t. input) of _dw3x3: correlate with flipped
    taps; the dx masks apply to the OUTPUT rows of the forward shift."""
    has_left, has_right = masks
    acc = jnp.zeros_like(dz)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            t = taps[(dy + 1) * 3 + (dx + 1)]
            g = dz
            if dx == -1:
                g = g * has_left
            elif dx == 1:
                g = g * has_right
            acc = acc + _shift(g, -(dy * w + dx), hw) * t
    return acc


def _reference_dw_chain(x, taps, dwb, s1, b1, s2, b2, w: int,
                        keep=None, rate: float = 0.0, eps: float = 1e-5):
    """Plain-XLA oracle. x: (N, HW, C); taps (9, C); s/b (HW, C)."""
    n, hw, c = x.shape
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    z1 = _gelu((x32 - mean) * jax.lax.rsqrt(var + eps) * s1[None] + b1[None])
    masks = tuple(jnp.asarray(m) for m in _row_masks(hw, w))
    z2 = jax.vmap(lambda zz: _dw3x3(zz, taps, dwb, hw, w, masks))(z1)
    mean2 = jnp.mean(z2, axis=(1, 2), keepdims=True)
    var2 = jnp.var(z2, axis=(1, 2), keepdims=True)
    z3 = _gelu((z2 - mean2) * jax.lax.rsqrt(var2 + eps) * s2[None] + b2[None])
    if keep is not None and rate > 0.0:
        z3 = jnp.where(keep, z3 / (1.0 - rate), 0.0)
    return z3.astype(x.dtype)


def _sample_forward(xs, taps, dwb, s1, b1, s2, b2, w: int, hw: int,
                    masks, eps: float):
    """One sample's chain in f32; returns (z3 pre-dropout, intermediates)."""
    mean = jnp.mean(xs)
    var = jnp.mean(jnp.square(xs - mean))
    rstd1 = jax.lax.rsqrt(var + eps)
    xhat1 = (xs - mean) * rstd1
    a1 = xhat1 * s1 + b1
    z1 = _gelu(a1)
    z2 = _dw3x3(z1, taps, dwb, hw, w, masks)
    mean2 = jnp.mean(z2)
    var2 = jnp.mean(jnp.square(z2 - mean2))
    rstd2 = jax.lax.rsqrt(var2 + eps)
    xhat2 = (z2 - mean2) * rstd2
    a2 = xhat2 * s2 + b2
    z3 = _gelu(a2)
    return z3, (xhat1, rstd1, a1, z1, xhat2, rstd2, a2)


def _fwd_kernel(seed_ref, x_ref, taps_ref, dwb_ref, s1_ref, b1_ref, s2_ref,
                b2_ref, o_ref, *, w: int, rate: float, eps: float):
    i = pl.program_id(0)
    sblk, hw, c = x_ref.shape
    masks = _row_masks_iota(hw, w)
    taps = taps_ref[:].astype(jnp.float32)
    dwb = dwb_ref[:].astype(jnp.float32)
    s1, b1 = s1_ref[:], b1_ref[:]
    s2, b2 = s2_ref[:], b2_ref[:]
    for si in range(sblk):
        xs = x_ref[si].astype(jnp.float32)
        z3, _ = _sample_forward(xs, taps, dwb, s1, b1, s2, b2, w, hw,
                                masks, eps)
        if rate > 0.0:
            keep = _keep_sample(seed_ref[0].astype(jnp.uint32),
                                jnp.uint32(i * sblk + si), hw, c, rate)
            z3 = jnp.where(keep, z3 / (1.0 - rate), 0.0)
        o_ref[si] = z3.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, taps_ref, dwb_ref, s1_ref, b1_ref, s2_ref,
                b2_ref, g_ref, dx_ref, dtaps_ref, ddwb_ref, ds1_ref, db1_ref,
                ds2_ref, db2_ref, *, w: int, rate: float, eps: float):
    i = pl.program_id(0)
    sblk, hw, c = x_ref.shape
    masks = _row_masks_iota(hw, w)
    taps = taps_ref[:].astype(jnp.float32)
    dwb = dwb_ref[:].astype(jnp.float32)
    s1, b1 = s1_ref[:], b1_ref[:]
    s2, b2 = s2_ref[:], b2_ref[:]
    n_el = jnp.float32(hw * c)

    dtaps = jnp.zeros_like(taps)
    ddwb = jnp.zeros_like(dwb)
    ds1 = jnp.zeros_like(s1)
    db1 = jnp.zeros_like(b1)
    ds2 = jnp.zeros_like(s2)
    db2 = jnp.zeros_like(b2)
    has_left, has_right = masks

    for si in range(sblk):
        xs = x_ref[si].astype(jnp.float32)
        gs = g_ref[si].astype(jnp.float32)
        _, (xhat1, rstd1, a1, z1, xhat2, rstd2, a2) = _sample_forward(
            xs, taps, dwb, s1, b1, s2, b2, w, hw, masks, eps)
        if rate > 0.0:
            keep = _keep_sample(seed_ref[0].astype(jnp.uint32),
                                jnp.uint32(i * sblk + si), hw, c, rate)
            gs = jnp.where(keep, gs / (1.0 - rate), 0.0)
        da2 = gs * _gelu_grad(a2)
        ds2 = ds2 + da2 * xhat2
        db2 = db2 + da2
        dxh2 = da2 * s2
        # whole-sample LayerNorm backward (scalar stats)
        dz2 = (dxh2 - jnp.mean(dxh2)
               - xhat2 * jnp.mean(dxh2 * xhat2)) * rstd2
        # depthwise conv backward
        ddwb = ddwb + jnp.sum(dz2, axis=0)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                sh = _shift(z1, dy * w + dx, hw)
                if dx == -1:
                    sh = sh * has_left
                elif dx == 1:
                    sh = sh * has_right
                tap_idx = (dy + 1) * 3 + (dx + 1)
                contrib = jnp.sum(sh * dz2, axis=0)        # (C,)
                dtaps = _acc_row(dtaps, tap_idx, contrib)
        dz1 = _dw3x3_t(dz2, taps, hw, w, masks)
        da1 = dz1 * _gelu_grad(a1)
        ds1 = ds1 + da1 * xhat1
        db1 = db1 + da1
        dxh1 = da1 * s1
        dx = (dxh1 - jnp.mean(dxh1)
              - xhat1 * jnp.mean(dxh1 * xhat1)) * rstd1
        dx_ref[si] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dtaps_ref[:] = dtaps
        ddwb_ref[:] = ddwb
        ds1_ref[:] = ds1
        db1_ref[:] = db1
        ds2_ref[:] = ds2
        db2_ref[:] = db2

    @pl.when(i > 0)
    def _():
        dtaps_ref[:] = dtaps_ref[:] + dtaps
        ddwb_ref[:] = ddwb_ref[:] + ddwb
        ds1_ref[:] = ds1_ref[:] + ds1
        db1_ref[:] = db1_ref[:] + db1
        ds2_ref[:] = ds2_ref[:] + ds2
        db2_ref[:] = db2_ref[:] + db2


def _acc_row(mat, row: int, vec):
    """mat (9, C) with mat[row] += vec, via a static one-hot (no scatter)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (mat.shape[0], 1), 0)
    return mat + (rows == row).astype(mat.dtype) * vec[None, :]


def _pad_samples(z, blk):
    pad = (-z.shape[0]) % blk
    if pad:
        z = jnp.concatenate(
            [z, jnp.zeros((pad,) + z.shape[1:], z.dtype)], axis=0)
    return z


def _specs(hw, c, sblk):
    sample = pl.BlockSpec((sblk, hw, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    taps = pl.BlockSpec((9, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM)
    aff = pl.BlockSpec((hw, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return sample, taps, vec, aff


def _forward(x, taps, dwb, s1, b1, s2, b2, seed, w: int, rate: float,
             block_samples: int, interpret: bool):
    n, hw, c = x.shape
    sblk = min(block_samples, n)
    xp = _pad_samples(x, sblk)
    seed = jnp.asarray(seed).astype(jnp.int32).reshape(1)
    sample, taps_s, vec, aff = _specs(hw, c, sblk)
    f32 = jnp.float32
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, w=w, rate=rate, eps=1e-5),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        grid=(xp.shape[0] // sblk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  sample, taps_s, vec, aff, aff, aff, aff],
        out_specs=sample,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(seed, xp, taps.astype(f32), dwb.astype(f32), s1.astype(f32),
      b1.astype(f32), s2.astype(f32), b2.astype(f32))
    return out[:n]


def _backward(x, taps, dwb, s1, b1, s2, b2, seed, g, w: int, rate: float,
              block_samples: int, interpret: bool):
    n, hw, c = x.shape
    sblk = min(block_samples, n)
    xp = _pad_samples(x, sblk)
    gp = _pad_samples(g, sblk)
    seed = jnp.asarray(seed).astype(jnp.int32).reshape(1)
    sample, taps_s, vec, aff = _specs(hw, c, sblk)
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, w=w, rate=rate, eps=1e-5),
        out_shape=(
            jax.ShapeDtypeStruct(xp.shape, x.dtype),       # dx
            jax.ShapeDtypeStruct((9, c), f32),             # dtaps
            jax.ShapeDtypeStruct((c,), f32),               # ddwb
            jax.ShapeDtypeStruct((hw, c), f32),            # ds1
            jax.ShapeDtypeStruct((hw, c), f32),            # db1
            jax.ShapeDtypeStruct((hw, c), f32),            # ds2
            jax.ShapeDtypeStruct((hw, c), f32),            # db2
        ),
        grid=(xp.shape[0] // sblk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  sample, taps_s, vec, aff, aff, aff, aff, sample],
        out_specs=(sample, taps_s, vec, aff, aff, aff, aff),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(seed, xp, taps.astype(f32), dwb.astype(f32), s1.astype(f32),
      b1.astype(f32), s2.astype(f32), b2.astype(f32), gp)
    dx = outs[0][:n]
    dtaps, ddwb, ds1, db1, ds2, db2 = outs[1:]
    cast = lambda grad, ref: grad.astype(ref.dtype)
    return (dx, cast(dtaps, taps), cast(ddwb, dwb), cast(ds1, s1),
            cast(db1, b1), cast(ds2, s2), cast(db2, b2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_dw_chain(x, taps, dwb, s1, b1, s2, b2, seed=0, w: int = 8,
                   rate: float = 0.0, block_samples: int = 8,
                   interpret: bool = False):
    """norm1 -> GELU -> dw3x3 -> norm2 -> GELU -> drop over (N, HW, C).

    ``taps``: (9, C) depthwise weights row-major (dy, dx); ``dwb``: (C,)
    conv bias; ``s1``/``b1``/``s2``/``b2``: (HW, C) LayerNormHWC affines.
    ``w``: the row-grid width (HW = H * w). The caller runs fc1 before and
    fc2 (+ norm3/GELU/drop) after, both in XLA.
    """
    return _forward(x, taps, dwb, s1, b1, s2, b2, seed, w, rate,
                    block_samples, interpret)


def _fwd(x, taps, dwb, s1, b1, s2, b2, seed, w, rate, block_samples,
         interpret):
    out = _forward(x, taps, dwb, s1, b1, s2, b2, seed, w, rate,
                   block_samples, interpret)
    return out, (x, taps, dwb, s1, b1, s2, b2, seed)


def _bwd(w, rate, block_samples, interpret, residuals, g):
    x, taps, dwb, s1, b1, s2, b2, seed = residuals
    grads = _backward(x, taps, dwb, s1, b1, s2, b2, seed, g, w, rate,
                      block_samples, interpret)
    dseed = np.zeros(jnp.shape(seed), jax.dtypes.float0)
    return grads + (dseed,)


fused_dw_chain.defvjp(_fwd, _bwd)
