"""Pallas attention-core kernel: softmax(q k^T * scale + bias) v for short
token sequences, without materializing logits in HBM.

Why: XLA tiles the trailing two dims of every tensor to (8, 128) sublanes x
lanes. Attention logits over T in {16, 19, 20} tokens therefore pad 6-8x —
measured 8.5x expansion, 192 MB for a (32, 64, 8, 19, 19) f32 logits tensor —
and that padding is real HBM traffic on every forward and backward. This
kernel keeps logits/weights in VMEM; only q, k, v and the output touch HBM.

Projections stay in XLA (full-width GEMMs are already at roofline there).
Grid = (batch tiles, heads): the head axis indexes per-head q/k/v blocks, so
no in-kernel reshapes cross the 66-wide head boundary (Mosaic cannot lower
those shape casts).

Backward runs the XLA reference via jax.custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reference_core(q, k, v, bias):
    """q/k/v: (B, H, T, D); bias: (H, T, T) or None. Softmax in f32."""
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * (d ** -0.5), k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias[None].astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, use_bias: bool):
    q = q_ref[:, 0]                      # (TB, T, D)
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    d = q.shape[-1]
    scale = d ** -0.5
    logits = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (TB, T, T)
    if use_bias:
        logits = logits + bias_ref[:].astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jax.lax.dot_general(
        weights, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(q.dtype)
    o_ref[:, 0] = out


def _core_forward(q, k, v, bias, block_b: int, interpret: bool):
    b, h, t, d = q.shape
    use_bias = bias is not None
    if bias is None:
        bias = jnp.zeros((h, t, t), jnp.float32)
    elif bias.shape[0] == 1 and h > 1:
        bias = jnp.broadcast_to(bias, (h, t, t))
    bias = bias.astype(jnp.float32)

    tb = min(block_b, b)
    pad = (-b) % tb
    if pad:
        zeros = jnp.zeros((pad, h, t, d), q.dtype)
        q = jnp.concatenate([q, zeros], axis=0)
        k = jnp.concatenate([k, zeros], axis=0)
        v = jnp.concatenate([v, zeros], axis=0)
    grid = (q.shape[0] // tb, h)

    seq = lambda: pl.BlockSpec((tb, 1, t, d), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, use_bias=use_bias),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[seq(), seq(), seq(),
                  pl.BlockSpec((1, t, t), lambda i, j: (j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=seq(),
        interpret=interpret,
    )(q, k, v, bias)
    return out[:b] if pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def attention_core(q, k, v, bias, block_b: int = 128,
                   interpret: bool = False):
    """Fused softmax attention over (B, H, T, D) with T small.

    ``bias``: optional (H | 1, T, T) additive logit bias (RPE and/or causal
    mask as -1e30). Gradients flow via the XLA reference backward.
    """
    return _core_forward(q, k, v, bias, block_b, interpret)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, *, use_bias: bool):
    """Recompute-and-differentiate backward for one (head, batch-tile) cell.

    Grid is (heads, batch_tiles) — heads OUTER so each head's dbias block is
    revisited on consecutive grid steps (accumulation-safe)."""
    i = pl.program_id(1)                 # batch tile index
    q = q_ref[:, 0]                      # (TB, T, D)
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    g = g_ref[:, 0]
    d = q.shape[-1]
    scale = d ** -0.5

    logits = jax.lax.dot_general(
        q * scale, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (TB, T, T)
    if use_bias:
        logits = logits + bias_ref[:].astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1)              # f32

    gf = g.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    # dv = w^T g
    dv = jax.lax.dot_general(
        w, gf, dimension_numbers=(((1,), (1,)), ((0,), (0,))))  # (TB, T, D)
    # dw = g v^T
    dw = jax.lax.dot_general(
        gf, vf, dimension_numbers=(((2,), (2,)), ((0,), (0,))))  # (TB, T, T)
    # softmax backward
    dl = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))      # (TB, T, T)
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
        dsum = jnp.sum(dl, axis=0)                   # (T, T)

        @pl.when(i == 0)
        def _():
            dbias_ref[0] = dsum

        @pl.when(i > 0)
        def _():
            dbias_ref[0] = dbias_ref[0] + dsum
    else:
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])


def _core_backward(q, k, v, bias, g, block_b: int, interpret: bool):
    b, h, t, d = q.shape
    use_bias = bias is not None
    bias_in = (jnp.broadcast_to(bias.astype(jnp.float32), (h, t, t))
               if use_bias else jnp.zeros((h, t, t), jnp.float32))

    tb = min(block_b, b)
    pad = (-b) % tb
    if pad:
        zeros = jnp.zeros((pad, h, t, d), q.dtype)
        q = jnp.concatenate([q, zeros], axis=0)
        k = jnp.concatenate([k, zeros], axis=0)
        v = jnp.concatenate([v, zeros], axis=0)
        g = jnp.concatenate([g, jnp.zeros((pad, h, t, d), g.dtype)], axis=0)
    grid = (h, q.shape[0] // tb)         # heads outer (see kernel docstring)

    seq = lambda: pl.BlockSpec((tb, 1, t, d), lambda j, i: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)
    head_bias = lambda: pl.BlockSpec((1, t, t), lambda j, i: (j, 0, 0),
                                     memory_space=pltpu.VMEM)
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, use_bias=use_bias),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct((h, t, t), jnp.float32)),
        grid=grid,
        in_specs=[seq(), seq(), seq(), head_bias(), seq()],
        out_specs=(seq(), seq(), seq(), head_bias()),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(q, k, v, bias_in, g)
    if pad:
        dq, dk, dv = dq[:b], dk[:b], dv[:b]
    if not use_bias:
        return dq, dk, dv, None
    if bias.shape[0] == 1:
        dbias = jnp.sum(dbias, axis=0, keepdims=True)
    return dq, dk, dv, dbias.astype(bias.dtype)


def _fwd(q, k, v, bias, block_b, interpret):
    return _core_forward(q, k, v, bias, block_b, interpret), (q, k, v, bias)


def _bwd(block_b, interpret, residuals, g):
    q, k, v, bias = residuals
    return _core_backward(q, k, v, bias, g, block_b, interpret)


attention_core.defvjp(_fwd, _bwd)
