"""Pallas fused pointwise-conv + per-sample LayerNorm + GELU.

The conv feed-forward's 1x1 convs (MlpDWBN fc1/fc2, reference:
VidHRFormer_modules.py:376-442) are GEMMs whose outputs immediately feed a
LayerNorm over the whole (H, W, C) feature map (torch LayerNorm((C,H,W)) ≙
LayerNormHWC) and a GELU. XLA materializes the GEMM output to HBM, then the
two-pass norm reads it twice and writes once — ~3 activation round-trips at
the 4x-hidden width (51 MB each at the parity geometry). This kernel grids
over blocks of samples, keeps the (S, HW, C) feature block in VMEM through
GEMM -> per-sample stats -> affine -> GELU, and touches HBM once each way.

The GEMM runs on the (S*HW, Cin) flattening; Mosaic only lowers that shape
cast when HW is a sublane-tile multiple (8x8 windows = 64 ✓ — callers with
odd spatial sizes should stay on the XLA path).

Forward and backward are both Pallas kernels (same recompute-and-accumulate
pattern as ops/fused_window_attention: weight/bias/affine grads accumulate
across the sample grid; the single grid axis makes += race-free).

Semantics (all in f32 where it matters):
    u    = x @ w + b                      # (HW, Cin) x (Cin, Cout)
    zhat = (u - mean(u)) * rsqrt(var(u) + eps)   # stats over ALL HW*Cout
    y    = gelu(zhat * scale + bias2)     # exact (erf) GELU, per-element
                                          # affine of LayerNorm((C,H,W))
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT_2 = math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf, |error| <= 1.5e-7 (below f32
    epsilon for gelu's purposes). Mosaic has no erf lowering; exp it has."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(a):
    return 0.5 * a * (1.0 + _erf(a / _SQRT_2))


def _gelu_grad(a):
    cdf = 0.5 * (1.0 + _erf(a / _SQRT_2))
    pdf = jnp.exp(-0.5 * a * a) * _INV_SQRT_2PI
    return cdf + a * pdf


def _reference(x, w, b, scale, bias2, eps: float = 1e-5):
    """Plain-XLA reference/oracle. x: (N, HW, Cin); scale/bias2: (HW, Cout)."""
    u = jnp.einsum("nhc,cd->nhd", x, w,
                   preferred_element_type=jnp.float32) + b
    mean = jnp.mean(u, axis=(1, 2), keepdims=True)
    var = jnp.var(u, axis=(1, 2), keepdims=True)
    zhat = (u - mean) * jax.lax.rsqrt(var + eps)
    a = zhat * scale[None] + bias2[None]
    return _gelu(a).astype(x.dtype)


def _project(x_ref, w_ref, b_ref):
    """(S, HW, Cin) block -> u (S, HW, Cout) f32 after the GEMM."""
    s_blk, hw, cin = x_ref.shape
    x2 = x_ref[:].reshape(s_blk * hw, cin)
    u = jnp.dot(x2, w_ref[:], preferred_element_type=jnp.float32)
    return (u + b_ref[:].astype(jnp.float32)).reshape(s_blk, hw, -1)


# NOTE: stats run per sample with SCALAR mean/var in a static loop — the
# vectorized keepdims form produces (S, 1, 1) intermediates that crash
# Mosaic's layout inference (CHECK failure in layout.h).

def _fwd_kernel(x_ref, w_ref, b_ref, s_ref, t_ref, o_ref, *, eps: float):
    u = _project(x_ref, w_ref, b_ref)
    scale, shift = s_ref[:], t_ref[:]
    for si in range(u.shape[0]):
        us = u[si]                                    # (HW, Cout)
        mean = jnp.mean(us)
        var = jnp.mean(jnp.square(us - mean))
        zhat = (us - mean) * jax.lax.rsqrt(var + eps)
        o_ref[si] = _gelu(zhat * scale + shift).astype(o_ref.dtype)


def _bwd_kernel(x_ref, w_ref, b_ref, s_ref, t_ref, g_ref,
                dx_ref, dw_ref, db_ref, ds_ref, dt_ref, *, eps: float):
    i = pl.program_id(0)
    s_blk, hw, cin = x_ref.shape
    u = _project(x_ref, w_ref, b_ref)
    scale, shift = s_ref[:], t_ref[:]

    du_parts = []
    ds = jnp.zeros_like(scale)
    dt = jnp.zeros_like(shift)
    for si in range(s_blk):
        us = u[si]
        gs = g_ref[si].astype(jnp.float32)
        mean = jnp.mean(us)
        var = jnp.mean(jnp.square(us - mean))
        rstd = jax.lax.rsqrt(var + eps)
        zhat = (us - mean) * rstd
        a = zhat * scale + shift
        da = gs * _gelu_grad(a)
        ds = ds + da * zhat
        dt = dt + da
        dz = da * scale
        # LayerNorm backward over this sample's HW*Cout elements
        du_parts.append(
            (dz - jnp.mean(dz) - zhat * jnp.mean(dz * zhat)) * rstd)
    du2 = jnp.concatenate(du_parts, axis=0)           # (S*HW, Cout)
    x2 = x_ref[:].reshape(s_blk * hw, cin).astype(jnp.float32)
    dw = jnp.dot(x2.T, du2, preferred_element_type=jnp.float32)
    db = jnp.sum(du2, axis=0)
    dx = jnp.dot(du2, w_ref[:].astype(jnp.float32).T,
                 preferred_element_type=jnp.float32)
    dx_ref[:] = dx.astype(dx_ref.dtype).reshape(s_blk, hw, cin)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = dw
        db_ref[:] = db
        ds_ref[:] = ds
        dt_ref[:] = dt

    @pl.when(i > 0)
    def _():
        dw_ref[:] = dw_ref[:] + dw
        db_ref[:] = db_ref[:] + db
        ds_ref[:] = ds_ref[:] + ds
        dt_ref[:] = dt_ref[:] + dt


def _specs(hw, cin, cout, s_blk):
    sample_in = pl.BlockSpec((s_blk, hw, cin), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    sample_out = pl.BlockSpec((s_blk, hw, cout), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((cin, cout), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((cout,), lambda i: (0,), memory_space=pltpu.VMEM)
    aff = pl.BlockSpec((hw, cout), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    return sample_in, sample_out, mat, vec, aff


def _pad_samples(x, s_blk):
    n = x.shape[0]
    pad = (-n) % s_blk
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return x, n


def _forward(x, w, b, scale, bias2, eps: float, block_samples: int,
             interpret: bool):
    n, hw, cin = x.shape
    cout = w.shape[1]
    s_blk = min(block_samples, n)
    x, n0 = _pad_samples(x, s_blk)
    sample_in, sample_out, mat, vec, aff = _specs(hw, cin, cout, s_blk)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], hw, cout), x.dtype),
        grid=(x.shape[0] // s_blk,),
        in_specs=[sample_in, mat, vec, aff, aff],
        out_specs=sample_out,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, w, b, scale.astype(jnp.float32), bias2.astype(jnp.float32))
    return out[:n0]


def _backward(x, w, b, scale, bias2, g, eps: float, block_samples: int,
              interpret: bool):
    n, hw, cin = x.shape
    cout = w.shape[1]
    s_blk = min(block_samples, n)
    x, n0 = _pad_samples(x, s_blk)
    g, _ = _pad_samples(g, s_blk)
    sample_in, sample_out, mat, vec, aff = _specs(hw, cin, cout, s_blk)
    f32 = jnp.float32
    dx, dw, db, ds, dt = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct((cin, cout), f32),
                   jax.ShapeDtypeStruct((cout,), f32),
                   jax.ShapeDtypeStruct((hw, cout), f32),
                   jax.ShapeDtypeStruct((hw, cout), f32)),
        grid=(x.shape[0] // s_blk,),
        in_specs=[sample_in, mat, vec, aff, aff, sample_out],
        out_specs=(sample_in, mat, vec, aff, aff),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, w, b, scale.astype(jnp.float32), bias2.astype(jnp.float32), g)
    return (dx[:n0], dw.astype(w.dtype), db.astype(b.dtype),
            ds.astype(scale.dtype), dt.astype(bias2.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def conv_ln_gelu(x, w, b, scale, bias2, eps: float = 1e-5,
                 interpret: bool = False, block_samples: int = 8):
    """Fused 1x1-conv + LayerNormHWC + exact GELU over (N, HW, Cin).

    ``scale``/``bias2``: the LayerNorm's per-element affine, flattened to
    (HW, Cout). Returns (N, HW, Cout) in x.dtype. Fully differentiable with
    Pallas kernels both directions. ``block_samples`` batches the per-sample
    grid for bigger GEMMs (padded zero samples contribute nothing to the
    accumulated grads: their du is finite and multiplied by zero inputs).
    """
    return _forward(x, w, b, scale, bias2, eps, block_samples, interpret)


def _vjp_fwd(x, w, b, scale, bias2, eps, interpret, block_samples):
    out = _forward(x, w, b, scale, bias2, eps, block_samples, interpret)
    return out, (x, w, b, scale, bias2)


def _vjp_bwd(eps, interpret, block_samples, residuals, g):
    x, w, b, scale, bias2 = residuals
    return _backward(x, w, b, scale, bias2, g, eps, block_samples, interpret)


conv_ln_gelu.defvjp(_vjp_fwd, _vjp_bwd)
