"""Pallas fused self-attention for short token sequences on TPU.

Fuses an attention sublayer body — q/k/v projections, scaled dot-product
attention over a short token axis (win^2 spatial tokens or T temporal
tokens), optional additive bias (relative position bias and/or a causal
mask), and the output projection — into one kernel, so per-window q/k/v and
attention intermediates never round-trip to HBM. The XLA path materializes
~5 activation-sized tensors per layer; at (N*T*windows, 16, 528) that is
~64 MB of HBM traffic per layer this kernel avoids.

Forward-only: the backward pass uses the XLA reference implementation via
``jax.custom_vjp`` (backward is matmul-bound, where XLA is already at
roofline; the fusion win is the forward's memory traffic).

Semantics match ``vptr_tpu.models.layers.dot_product_attention`` + separate
q/k/v/out Dense layers: softmax in float32, q scaled by head_dim^-0.5,
q/k computed from ``x_qk`` and v from ``x_v`` (they differ in the NAR
decoder's query self-attention, reference: VidHRFormer_modules.py:176-178).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reference_attention(x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias,
                         num_heads: int):
    """Plain-XLA reference with identical semantics (also the VJP source)."""
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
    weights = jax.nn.softmax(logits, axis=-1).astype(x_qk.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
    out = out.transpose(0, 2, 1, 3).reshape(bw, t, c)
    return jnp.einsum("btc,cd->btd", out, wo) + bo


def _kernel(xqk_ref, xv_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
            wo_ref, bo_ref, bias_ref, o_ref, *, num_heads: int,
            tokens: int, use_bias: bool):
    tb = xqk_ref.shape[0]
    c = xqk_ref.shape[-1]
    hd = c // num_heads
    xqk = xqk_ref[:].reshape(tb * tokens, c)
    xv = xv_ref[:].reshape(tb * tokens, c)

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
    weights = jax.nn.softmax(logits, axis=-1).astype(xqk.dtype)
    out = jax.lax.dot_general(
        weights, vh,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(xqk.dtype)  # (TB*H,T,D)
    out = out.reshape(tb, num_heads, tokens, hd).transpose(0, 2, 1, 3)
    out = out.reshape(tb * tokens, c)
    o_ref[:] = proj(out, wo_ref, bo_ref).reshape(tb, tokens, c)


def _fused_forward(x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias,
                   num_heads: int, block_windows: int, interpret: bool):
    bw, tokens, c = x_qk.shape
    use_bias = bias is not None
    if bias is None:
        bias = jnp.zeros((num_heads, tokens, tokens), jnp.float32)
    if bias.shape[0] == 1 and num_heads > 1:
        bias = jnp.broadcast_to(bias, (num_heads, tokens, tokens))

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
                          use_bias=use_bias),
        out_shape=jax.ShapeDtypeStruct(x_qk.shape, x_qk.dtype),
        grid=grid,
        in_specs=[
            seq(), seq(),
            mat(), vec(), mat(), vec(), mat(), vec(), mat(), vec(),
            pl.BlockSpec((num_heads, tokens, tokens), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=seq(),
        interpret=interpret,
    )(x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias)
    return out[:bw] if pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def fused_attention(x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias,
                    num_heads: int = 8, block_windows: int = 64,
                    interpret: bool = False):
    """Fused short-sequence self-attention over (B, tokens, C).

    ``bias``: optional (heads | 1, tokens, tokens) additive logit bias —
    carries the RPE table and/or a causal mask (-1e30 upper triangle).
    Differentiable: backward runs the XLA reference path.
    """
    return _fused_forward(x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias,
                          num_heads, block_windows, interpret)


def _fwd(x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias, num_heads,
         block_windows, interpret):
    out = _fused_forward(x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias,
                         num_heads, block_windows, interpret)
    return out, (x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias)


def _bwd(num_heads, block_windows, interpret, residuals, g):
    x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias = residuals
    has_bias = bias is not None

    def ref(*args):
        if has_bias:
            return _reference_attention(*args, num_heads=num_heads)
        return _reference_attention(*args, None, num_heads=num_heads)

    primals = (x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo)
    if has_bias:
        primals = primals + (bias,)
    _, pullback = jax.vjp(ref, *primals)
    grads = pullback(g)
    if not has_bias:
        grads = grads + (None,)
    return grads


fused_attention.defvjp(_fwd, _bwd)

# backward-compat alias used by earlier tests
def fused_window_attention(x, wq, bq, wk, bk, wv, bv, wo, bo, bias,
                           num_heads: int = 8, block_windows: int = 64,
                           interpret: bool = False):
    return fused_attention(x, x, wq, bq, wk, bk, wv, bv, wo, bo, bias,
                           num_heads, block_windows, interpret)


def _reference_window_attention(x, wq, bq, wk, bk, wv, bv, wo, bo, bias,
                                num_heads: int):
    return _reference_attention(x, x, wq, bq, wk, bk, wv, bv, wo, bo, bias,
                                num_heads=num_heads)
