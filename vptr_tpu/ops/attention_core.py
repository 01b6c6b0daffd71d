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


def _fwd(q, k, v, bias, block_b, interpret):
    return _core_forward(q, k, v, bias, block_b, interpret), (q, k, v, bias)


def _bwd(block_b, interpret, residuals, g):
    q, k, v, bias = residuals
    has_bias = bias is not None

    def ref(*args):
        if has_bias:
            return _reference_core(*args)
        return _reference_core(*args, None)

    primals = (q, k, v) + ((bias,) if has_bias else ())
    _, pullback = jax.vjp(ref, *primals)
    grads = pullback(g)
    if not has_bias:
        grads = grads + (None,)
    return grads


attention_core.defvjp(_fwd, _bwd)
