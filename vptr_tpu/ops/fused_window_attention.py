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

Mosaic constraints that shape this kernel: the (B*T, C) -> (B, T, H, hd)
head-split reshape splits the LANE dimension and does not lower when
hd < 128, and 3Dx2D dots flatten through a lane-hd reshape that fails the
same way. Heads are therefore handled with a static per-head loop over
unaligned lane slices (q[:, :, h*hd:(h+1)*hd] — supported), merged back via
a lane-axis concat before one full-width 2D out-proj GEMM. The
(tiles, T, C) <-> 2D casts additionally require the token count to be a
sublane-tile multiple — the wrappers pad the token axis in (masked softmax
columns, see ``_pad_tokens``), so odd counts like the T=19 temporal
attention still run fused.

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


def _keep_mask_head(seed, i, h, tb: int, t: int, num_heads: int,
                    rate: float) -> jnp.ndarray:
    """(TB, T, T) keep mask for head ``h`` of batch tile ``i``. The element
    index matches attention_core.dropout_keep_mask's
    ((b*H + h)*T + r)*T + c convention, so that jnp twin doubles as this
    kernel's test oracle."""
    b = jax.lax.broadcasted_iota(jnp.uint32, (tb, t, t), 0) \
        + jnp.uint32(i * tb)
    r = jax.lax.broadcasted_iota(jnp.uint32, (tb, t, t), 1)
    c = jax.lax.broadcasted_iota(jnp.uint32, (tb, t, t), 2)
    idx = ((b * jnp.uint32(num_heads) + jnp.uint32(h)) * jnp.uint32(t) + r) \
        * jnp.uint32(t) + c
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


def _proj(x2, w_ref, b_ref, tb, tokens, c):
    y = jnp.dot(x2, w_ref[:], preferred_element_type=jnp.float32)
    y = (y + b_ref[:].astype(jnp.float32)).astype(x2.dtype)
    return y.reshape(tb, tokens, c)          # major-dim split: supported


# Mosaic's default scoped-VMEM budget is 16 MB; the padded-token (T=32)
# backward holds ~20 MB of stack (dx tile + per-head recompute chain), which
# aborts the compile with a scoped-vmem OOM. v5e has 128 MB of VMEM per
# core; 64 MB leaves ample room for pipeline double-buffering.
_VMEM_LIMIT = 64 * 1024 * 1024

_BATCHED_QKT = (((2,), (2,)), ((0,), (0,)))   # (B,T,D)x(B,T,D) -> (B,T,T)
_BATCHED_AV = (((2,), (1,)), ((0,), (0,)))    # (B,T,T)x(B,T,D) -> (B,T,D)
_BATCHED_WTG = (((1,), (1,)), ((0,), (0,)))   # w^T g per batch


def _head_attention(q3, k3, v3, bias_ref, seed_ref, i, h, sl, *,
                    use_bias: bool, rate: float, num_heads: int):
    """One head's softmax(q k^T * scale + bias) with dropout; returns
    (w f32 pre-dropout, w_drop compute-dtype, keep-or-None, qh, kh, vh)."""
    tb, tokens = q3.shape[0], q3.shape[1]
    hd = sl.stop - sl.start
    qh, kh, vh = q3[:, :, sl], k3[:, :, sl], v3[:, :, sl]
    scale = hd ** -0.5
    logits = jax.lax.dot_general(qh * scale, kh, _BATCHED_QKT,
                                 preferred_element_type=jnp.float32)
    if use_bias:
        logits = logits + bias_ref[h].astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1)
    keep = None
    if rate > 0.0:
        keep = _keep_mask_head(seed_ref[0].astype(jnp.uint32), i, h,
                               tb, tokens, num_heads, rate)
        w_drop = jnp.where(keep, w / (1.0 - rate), 0.0)
    else:
        w_drop = w
    return w, w_drop.astype(q3.dtype), keep, qh, kh, vh


def _kernel(seed_ref, xqk_ref, xv_ref, wq_ref, bq_ref, wk_ref, bk_ref,
            wv_ref, bv_ref, wo_ref, bo_ref, bias_ref, o_ref, *,
            num_heads: int, tokens: int, use_bias: bool, rate: float):
    i = pl.program_id(0)
    tb = xqk_ref.shape[0]
    c = xqk_ref.shape[-1]
    hd = c // num_heads
    xqk = xqk_ref[:].reshape(tb * tokens, c)
    xv = xv_ref[:].reshape(tb * tokens, c)

    q3 = _proj(xqk, wq_ref, bq_ref, tb, tokens, c)
    k3 = _proj(xqk, wk_ref, bk_ref, tb, tokens, c)
    v3 = _proj(xv, wv_ref, bv_ref, tb, tokens, c)

    attn_parts = []
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        _, w_drop, _, _, _, vh = _head_attention(
            q3, k3, v3, bias_ref, seed_ref, i, h, sl, use_bias=use_bias,
            rate=rate, num_heads=num_heads)
        attn_parts.append(jax.lax.dot_general(
            w_drop, vh, _BATCHED_AV,
            preferred_element_type=jnp.float32).astype(q3.dtype))
    # merge heads on the lane axis, then one full-width out projection
    # (per-head (TB,T,hd) x (hd,C) dots would flatten to a lane-16 reshape
    # Mosaic cannot lower; the lane-128 merge + 2D GEMM can)
    attn2 = jnp.concatenate(attn_parts, axis=-1).reshape(tb * tokens, c)
    out = jnp.dot(attn2, wo_ref[:], preferred_element_type=jnp.float32)
    out = out + bo_ref[:].astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype).reshape(tb, tokens, c)


def _prep(bias, num_heads, tokens, seed):
    use_bias = bias is not None
    if bias is None:
        bias = jnp.zeros((num_heads, tokens, tokens), jnp.float32)
    if bias.shape[0] == 1 and num_heads > 1:
        bias = jnp.broadcast_to(bias, (num_heads, tokens, tokens))
    bias = bias.astype(jnp.float32)
    seed = jnp.asarray(seed).astype(jnp.int32).reshape(1)
    return bias, use_bias, seed


def _pad_tokens(x_qk, x_v, bias, g=None):
    """Pad the token axis up to a sublane-tile multiple so the kernel's
    (tiles, T, C) <-> 2D shape casts lower (Mosaic requirement).

    Padded KEY columns are masked with -1e30 bias (softmax weight exactly 0
    for every real query); padded QUERY rows attend over real keys but their
    outputs are sliced away and their cotangents arrive as zeros, so no
    gradient flows through them (padded x rows are zero, so they contribute
    nothing to weight grads either). This lifts the T % sublane caller gate —
    e.g. the T=19 temporal attention pads to 32 in-kernel. The XLA-side pad
    fuses into the producer of x (a transpose), so the copy is ~free.
    """
    l = x_qk.shape[1]
    sublane = 16 if x_qk.dtype == jnp.bfloat16 else 8
    lp = -(-l // sublane) * sublane
    if lp == l:
        return x_qk, x_v, bias, g, l
    pad3 = lambda z: jnp.pad(z, ((0, 0), (0, lp - l), (0, 0)))
    x_qk, x_v = pad3(x_qk), pad3(x_v)
    if g is not None:
        g = pad3(g)
    nb = bias.shape[0] if bias is not None else 1
    pb = jnp.zeros((nb, lp, lp), jnp.float32)
    pb = pb.at[:, :, l:].set(jnp.float32(-1e30))
    if bias is not None:
        pb = pb.at[:, :l, :l].set(bias.astype(jnp.float32))
    return x_qk, x_v, pb, g, l


def _specs(c, num_heads, tokens, tb):
    mat = lambda: pl.BlockSpec((c, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    vec = lambda: pl.BlockSpec((c,), lambda i: (0,),
                               memory_space=pltpu.VMEM)
    seq = lambda: pl.BlockSpec((tb, tokens, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    bias = lambda: pl.BlockSpec((num_heads, tokens, tokens),
                                lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    return mat, vec, seq, bias


def _fused_forward(x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias, seed,
                   num_heads: int, rate: float, block_windows: int,
                   interpret: bool):
    x_qk, x_v, bias, _, l_orig = _pad_tokens(x_qk, x_v, bias)
    bw, tokens, c = x_qk.shape
    bias, use_bias, seed = _prep(bias, num_heads, tokens, seed)

    tb = min(block_windows, bw)
    pad = (-bw) % tb
    if pad:
        zeros = jnp.zeros((pad, tokens, c), x_qk.dtype)
        x_qk = jnp.concatenate([x_qk, zeros], axis=0)
        x_v = jnp.concatenate([x_v, zeros], axis=0)
    grid = (x_qk.shape[0] // tb,)

    mat, vec, seq, bias_spec = _specs(c, num_heads, tokens, tb)
    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, tokens=tokens,
                          use_bias=use_bias, rate=rate),
        out_shape=jax.ShapeDtypeStruct(x_qk.shape, x_qk.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            seq(), seq(),
            mat(), vec(), mat(), vec(), mat(), vec(), mat(), vec(),
            bias_spec(),
        ],
        out_specs=seq(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(seed, x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias)
    if pad:
        out = out[:bw]
    return out[:, :l_orig] if l_orig != tokens else out


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
    g2 = g_ref[:].reshape(tb * tokens, c).astype(jnp.float32)

    q3 = _proj(xqk, wq_ref, bq_ref, tb, tokens, c)
    k3 = _proj(xqk, wk_ref, bk_ref, tb, tokens, c)
    v3 = _proj(xv, wv_ref, bv_ref, tb, tokens, c)

    # dao = g @ wo^T, per-head slices consumed in the loop
    dao3 = jax.lax.dot_general(
        g2, wo_ref[:].astype(jnp.float32), (((1,), (1,)), ((), ()))
    ).reshape(tb, tokens, c)

    attn_parts, dq_parts, dk_parts, dv_parts = [], [], [], []
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        w, w_drop, keep, qh, kh, vh = _head_attention(
            q3, k3, v3, bias_ref, seed_ref, i, h, sl, use_bias=use_bias,
            rate=rate, num_heads=num_heads)
        attn_parts.append(jax.lax.dot_general(
            w_drop, vh, _BATCHED_AV,
            preferred_element_type=jnp.float32).astype(q3.dtype))
        dao_h = dao3[:, :, sl]
        wd32 = w_drop.astype(jnp.float32)
        dv_parts.append(jax.lax.dot_general(wd32, dao_h, _BATCHED_WTG))
        dwd = jax.lax.dot_general(dao_h, vh.astype(jnp.float32),
                                  _BATCHED_QKT)            # (TB, T, T)
        if rate > 0.0:
            dw = jnp.where(keep, dwd / (1.0 - rate), 0.0)
        else:
            dw = dwd
        # softmax backward on the PRE-dropout weights
        dl = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
        scale = hd ** -0.5
        dq_parts.append(jax.lax.dot_general(
            dl, kh.astype(jnp.float32), _BATCHED_AV) * scale)
        dk_parts.append(jax.lax.dot_general(
            dl, (qh * scale).astype(jnp.float32), _BATCHED_WTG))
        if use_bias:
            dsum = jnp.sum(dl, axis=0)                      # (T, T)

            @pl.when(i == 0)
            def _():
                dbias_ref[h] = dsum

            @pl.when(i > 0)
            def _():
                dbias_ref[h] = dbias_ref[h] + dsum

    merge = lambda parts: jnp.concatenate(parts, axis=-1).reshape(
        tb * tokens, c)
    attn2 = merge(attn_parts).astype(jnp.float32)
    dq2, dk2, dv2 = merge(dq_parts), merge(dk_parts), merge(dv_parts)

    contract0 = (((0,), (0,)), ((), ()))       # a^T b over the row axis
    dwq = jax.lax.dot_general(xqk.astype(jnp.float32), dq2, contract0)
    dwk = jax.lax.dot_general(xqk.astype(jnp.float32), dk2, contract0)
    dwv = jax.lax.dot_general(xv.astype(jnp.float32), dv2, contract0)
    dwo = jax.lax.dot_general(attn2, g2, contract0)
    dbq, dbk, dbv = (jnp.sum(z, axis=0) for z in (dq2, dk2, dv2))
    dbo = jnp.sum(g2, axis=0)
    dxqk = (jax.lax.dot_general(dq2, wq_ref[:].astype(jnp.float32),
                                (((1,), (1,)), ((), ())))
            + jax.lax.dot_general(dk2, wk_ref[:].astype(jnp.float32),
                                  (((1,), (1,)), ((), ()))))
    dxv = jax.lax.dot_general(dv2, wv_ref[:].astype(jnp.float32),
                              (((1,), (1,)), ((), ())))

    dxqk_ref[:] = dxqk.astype(dxqk_ref.dtype).reshape(tb, tokens, c)
    dxv_ref[:] = dxv.astype(dxv_ref.dtype).reshape(tb, tokens, c)

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
        if not use_bias:
            dbias_ref[:] = jnp.zeros_like(dbias_ref)

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


def _fused_backward(x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias, seed, g,
                    num_heads: int, rate: float, block_windows: int,
                    interpret: bool):
    x_qk, x_v, bias_p, g, l_orig = _pad_tokens(x_qk, x_v, bias, g)
    bw, tokens, c = x_qk.shape
    bias_in, use_bias, seed_in = _prep(bias_p, num_heads, tokens, seed)

    tb = min(block_windows, bw)
    pad = (-bw) % tb
    if pad:
        zeros = jnp.zeros((pad, tokens, c), x_qk.dtype)
        x_qk = jnp.concatenate([x_qk, zeros], axis=0)
        x_v = jnp.concatenate([x_v, zeros], axis=0)
        g = jnp.concatenate([g, jnp.zeros((pad, tokens, c), g.dtype)], axis=0)
    grid = (x_qk.shape[0] // tb,)

    mat, vec, seq, bias_spec = _specs(c, num_heads, tokens, tb)
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
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(seed_in, x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias_in, g)
    dxqk, dxv = outs[0], outs[1]
    if pad:
        dxqk, dxv = dxqk[:bw], dxv[:bw]
    if l_orig != tokens:
        dxqk, dxv = dxqk[:, :l_orig], dxv[:, :l_orig]
    dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo, dbias = outs[2:]
    cast = lambda grad, ref: grad.astype(ref.dtype)
    grads = (dxqk, dxv, cast(dwq, wq), cast(dbq, bq), cast(dwk, wk),
             cast(dbk, bk), cast(dwv, wv), cast(dbv, bv), cast(dwo, wo),
             cast(dbo, bo))
    if bias is None:
        dbias_out = None
    else:
        dbias = dbias[:, :l_orig, :l_orig]
        if bias.shape[0] == 1:
            dbias_out = jnp.sum(dbias, axis=0,
                                keepdims=True).astype(bias.dtype)
        else:
            dbias_out = dbias.astype(bias.dtype)
    return grads + (dbias_out,)


# ---------------------------------------------------------------------------
# LN-folded single-input variant: LayerNorm + q/k positional add + the whole
# attention sublayer in one kernel.
#
# Every Pallas call is an opaque boundary to XLA fusion, so the sublayer's
# leading LayerNorm otherwise materializes its output to HBM just to feed the
# kernel (and again in backward). Folding it in — per-token stats over the
# lane axis, like the in-kernel softmax — removes that round-trip, and the
# single shared input stream replaces the separate x_qk/x_v DMAs of the
# generic kernel. Covers the encoder sublayers: q/k = LN(x) + pos (pos a
# shared (tokens, C) constant — the 2D window or 1D temporal sine table,
# never learned), v = LN(x), with optional logit bias (RPE table / causal
# mask). The NAR decoder's per-window query_pos case stays on the generic
# kernel.
# ---------------------------------------------------------------------------


def _ln_rows(x2, ls, lb, eps: float = 1e-5):
    """Per-row LayerNorm over the lane axis; returns (xn f32, xhat, rstd)."""
    mean = jnp.mean(x2, axis=1, keepdims=True)
    xc = x2 - mean
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + jnp.float32(eps))
    xhat = xc * rstd
    return xhat * ls + lb, xhat, rstd


def _reference_attention_ln(x, wq, bq, wk, bk, wv, bv, wo, bo, ls, lb, pos,
                            bias, num_heads: int, keep=None,
                            rate: float = 0.0):
    """XLA oracle: LN (f32 stats, cast to x.dtype) -> +pos on q/k -> MHA."""
    bw, t, c = x.shape
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    xn = ((x32 - mean) * jax.lax.rsqrt(var + 1e-5) * ls + lb).astype(x.dtype)
    xqk = xn + pos[None].astype(x.dtype) if pos is not None else xn
    return _reference_attention(xqk, xn, wq, bq, wk, bk, wv, bv, wo, bo,
                                bias, num_heads, keep=keep, rate=rate)


def _kernel_ln(seed_ref, x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
               bv_ref, wo_ref, bo_ref, ls_ref, lb_ref, pos_ref, bias_ref,
               scale_ref, o_ref, *, num_heads: int, tokens: int,
               use_bias: bool, use_pos: bool, rate: float, res: bool,
               use_scale: bool):
    i = pl.program_id(0)
    tb = x_ref.shape[0]
    c = x_ref.shape[-1]
    hd = c // num_heads
    x2 = x_ref[:].reshape(tb * tokens, c).astype(jnp.float32)
    xn32, _, _ = _ln_rows(x2, ls_ref[:], lb_ref[:])
    xn = xn32.astype(x_ref.dtype)
    if use_pos:
        xqk = (xn.reshape(tb, tokens, c)
               + pos_ref[:][None].astype(x_ref.dtype)).reshape(tb * tokens, c)
    else:
        xqk = xn

    q3 = _proj(xqk, wq_ref, bq_ref, tb, tokens, c)
    k3 = _proj(xqk, wk_ref, bk_ref, tb, tokens, c)
    v3 = _proj(xn, wv_ref, bv_ref, tb, tokens, c)

    attn_parts = []
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        _, w_drop, _, _, _, vh = _head_attention(
            q3, k3, v3, bias_ref, seed_ref, i, h, sl, use_bias=use_bias,
            rate=rate, num_heads=num_heads)
        attn_parts.append(jax.lax.dot_general(
            w_drop, vh, _BATCHED_AV,
            preferred_element_type=jnp.float32).astype(q3.dtype))
    attn2 = jnp.concatenate(attn_parts, axis=-1).reshape(tb * tokens, c)
    out = jnp.dot(attn2, wo_ref[:], preferred_element_type=jnp.float32)
    out = out + bo_ref[:].astype(jnp.float32)
    if use_scale:
        # per-window branch scale (DropPath mask / keep), broadcast over C
        out = (out.reshape(tb, tokens, c)
               * scale_ref[:][..., None]).reshape(tb * tokens, c)
    if res:
        out = out + x2   # residual add in f32 — the skip source is already
                         # in VMEM, so the XLA-side x + drop_path(y) read of
                         # both tensors never happens
    o_ref[:] = out.astype(o_ref.dtype).reshape(tb, tokens, c)


def _ln_pad(x, bias, pos, g=None):
    """Token-axis padding for the single-input LN kernel (see _pad_tokens)."""
    l = x.shape[1]
    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    lp = -(-l // sublane) * sublane
    if lp == l:
        return x, bias, pos, g, l
    pad3 = lambda z: jnp.pad(z, ((0, 0), (0, lp - l), (0, 0)))
    x = pad3(x)
    if g is not None:
        g = pad3(g)
    if pos is not None:
        pos = jnp.pad(pos, ((0, lp - l), (0, 0)))
    nb = bias.shape[0] if bias is not None else 1
    pb = jnp.zeros((nb, lp, lp), jnp.float32)
    pb = pb.at[:, :, l:].set(jnp.float32(-1e30))
    if bias is not None:
        pb = pb.at[:, :l, :l].set(bias.astype(jnp.float32))
    return x, pb, pos, g, l


def _ln_specs(c, num_heads, tokens, tb):
    mat, vec, seq, bias_spec = _specs(c, num_heads, tokens, tb)
    posspec = lambda: pl.BlockSpec((tokens, c), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    return mat, vec, seq, bias_spec, posspec


def _scale_rows(scale, bw_padded, tokens):
    """(BW,) per-window scale -> (BW_padded, tokens) f32 kernel input."""
    s = jnp.asarray(scale).astype(jnp.float32)
    if s.shape[0] < bw_padded:
        s = jnp.concatenate(
            [s, jnp.zeros((bw_padded - s.shape[0],), jnp.float32)])
    return jnp.repeat(s[:, None], tokens, axis=1)


def _fused_ln_forward(x, wq, bq, wk, bk, wv, bv, wo, bo, ls, lb, pos, bias,
                      seed, num_heads: int, rate: float, block_windows: int,
                      interpret: bool, scale=None, res: bool = False):
    x, bias, pos, _, l_orig = _ln_pad(x, bias, pos)
    bw, tokens, c = x.shape
    bias, use_bias, seed = _prep(bias, num_heads, tokens, seed)
    use_pos = pos is not None
    pos_in = (pos.astype(jnp.float32) if use_pos
              else jnp.zeros((tokens, c), jnp.float32))

    tb = min(block_windows, bw)
    pad = (-bw) % tb
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, tokens, c), x.dtype)], axis=0)
    grid = (x.shape[0] // tb,)
    use_scale = scale is not None
    # the unused-case dummy is a jit-time constant; its per-call DMA is
    # ~48 KB (<1 us at HBM bandwidth) — not worth a second kernel
    # signature without the operand
    scale_in = (_scale_rows(scale, x.shape[0], tokens) if use_scale
                else jnp.ones((x.shape[0], tokens), jnp.float32))

    mat, vec, seq, bias_spec, posspec = _ln_specs(c, num_heads, tokens, tb)
    scale_spec = pl.BlockSpec((tb, tokens), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_ln, num_heads=num_heads, tokens=tokens,
                          use_bias=use_bias, use_pos=use_pos, rate=rate,
                          res=res, use_scale=use_scale),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            seq(),
            mat(), vec(), mat(), vec(), mat(), vec(), mat(), vec(),
            vec(), vec(), posspec(), bias_spec(), scale_spec,
        ],
        out_specs=seq(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(seed, x, wq, bq, wk, bk, wv, bv, wo, bo,
      ls.astype(jnp.float32), lb.astype(jnp.float32), pos_in, bias, scale_in)
    if pad:
        out = out[:bw]
    return out[:, :l_orig] if l_orig != tokens else out


def _bwd_kernel_ln(seed_ref, x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
                   bv_ref, wo_ref, bo_ref, ls_ref, lb_ref, pos_ref, bias_ref,
                   scale_ref, g_ref, dx_ref, dwq_ref, dbq_ref, dwk_ref,
                   dbk_ref, dwv_ref, dbv_ref, dwo_ref, dbo_ref, dls_ref,
                   dlb_ref, dbias_ref, *, num_heads: int, tokens: int,
                   use_bias: bool, use_pos: bool, rate: float, res: bool,
                   use_scale: bool):
    """Recompute LN + forward in VMEM; emit per-tile dx and grid-accumulated
    weight / LN-affine / bias grads."""
    i = pl.program_id(0)
    tb = x_ref.shape[0]
    c = x_ref.shape[-1]
    hd = c // num_heads
    x2 = x_ref[:].reshape(tb * tokens, c).astype(jnp.float32)
    g2_raw = g_ref[:].reshape(tb * tokens, c).astype(jnp.float32)
    if use_scale:
        # the branch's upstream cotangent is scaled by the DropPath factor;
        # the residual skip (added below) passes g through unscaled
        g2 = (g2_raw.reshape(tb, tokens, c)
              * scale_ref[:][..., None]).reshape(tb * tokens, c)
    else:
        g2 = g2_raw
    xn32, xhat, rstd = _ln_rows(x2, ls_ref[:], lb_ref[:])
    xn = xn32.astype(x_ref.dtype)
    if use_pos:
        xqk = (xn.reshape(tb, tokens, c)
               + pos_ref[:][None].astype(x_ref.dtype)).reshape(tb * tokens, c)
    else:
        xqk = xn

    q3 = _proj(xqk, wq_ref, bq_ref, tb, tokens, c)
    k3 = _proj(xqk, wk_ref, bk_ref, tb, tokens, c)
    v3 = _proj(xn, wv_ref, bv_ref, tb, tokens, c)

    dao3 = jax.lax.dot_general(
        g2, wo_ref[:].astype(jnp.float32), (((1,), (1,)), ((), ()))
    ).reshape(tb, tokens, c)

    attn_parts, dq_parts, dk_parts, dv_parts = [], [], [], []
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        w, w_drop, keep, qh, kh, vh = _head_attention(
            q3, k3, v3, bias_ref, seed_ref, i, h, sl, use_bias=use_bias,
            rate=rate, num_heads=num_heads)
        attn_parts.append(jax.lax.dot_general(
            w_drop, vh, _BATCHED_AV,
            preferred_element_type=jnp.float32).astype(q3.dtype))
        dao_h = dao3[:, :, sl]
        wd32 = w_drop.astype(jnp.float32)
        dv_parts.append(jax.lax.dot_general(wd32, dao_h, _BATCHED_WTG))
        dwd = jax.lax.dot_general(dao_h, vh.astype(jnp.float32),
                                  _BATCHED_QKT)
        if rate > 0.0:
            dw = jnp.where(keep, dwd / (1.0 - rate), 0.0)
        else:
            dw = dwd
        dl = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
        scale = hd ** -0.5
        dq_parts.append(jax.lax.dot_general(
            dl, kh.astype(jnp.float32), _BATCHED_AV) * scale)
        dk_parts.append(jax.lax.dot_general(
            dl, (qh * scale).astype(jnp.float32), _BATCHED_WTG))
        if use_bias:
            dsum = jnp.sum(dl, axis=0)

            @pl.when(i == 0)
            def _():
                dbias_ref[h] = dsum

            @pl.when(i > 0)
            def _():
                dbias_ref[h] = dbias_ref[h] + dsum

    merge = lambda parts: jnp.concatenate(parts, axis=-1).reshape(
        tb * tokens, c)
    attn2 = merge(attn_parts).astype(jnp.float32)
    dq2, dk2, dv2 = merge(dq_parts), merge(dk_parts), merge(dv_parts)

    contract0 = (((0,), (0,)), ((), ()))
    dwq = jax.lax.dot_general(xqk.astype(jnp.float32), dq2, contract0)
    dwk = jax.lax.dot_general(xqk.astype(jnp.float32), dk2, contract0)
    dwv = jax.lax.dot_general(xn.astype(jnp.float32), dv2, contract0)
    dwo = jax.lax.dot_general(attn2, g2, contract0)
    dbq, dbk, dbv = (jnp.sum(z, axis=0) for z in (dq2, dk2, dv2))
    dbo = jnp.sum(g2, axis=0)
    # d(xn) = back through all three projections (q and k share the +pos
    # input whose derivative wrt xn is identity; pos itself is a constant)
    mm_t = lambda a, w_ref: jax.lax.dot_general(
        a, w_ref[:].astype(jnp.float32), (((1,), (1,)), ((), ())))
    dxn = mm_t(dq2, wq_ref) + mm_t(dk2, wk_ref) + mm_t(dv2, wv_ref)

    # LayerNorm backward (per-row stats over the lane axis)
    dls = jnp.sum(dxn * xhat, axis=0)
    dlb = jnp.sum(dxn, axis=0)
    dxhat = dxn * ls_ref[:]
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    dx = (dxhat - m1 - xhat * m2) * rstd
    if res:
        dx = dx + g2_raw   # residual skip: d(x + scale*branch)/dx = 1
    dx_ref[:] = dx.astype(dx_ref.dtype).reshape(tb, tokens, c)

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
        dls_ref[:] = dls
        dlb_ref[:] = dlb
        if not use_bias:
            dbias_ref[:] = jnp.zeros_like(dbias_ref)

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
        dls_ref[:] = dls_ref[:] + dls
        dlb_ref[:] = dlb_ref[:] + dlb


def _fused_ln_backward(x, wq, bq, wk, bk, wv, bv, wo, bo, ls, lb, pos, bias,
                       seed, g, num_heads: int, rate: float,
                       block_windows: int, interpret: bool, scale=None,
                       res: bool = False):
    x, bias_p, pos_p, g, l_orig = _ln_pad(x, bias, pos, g)
    bw, tokens, c = x.shape
    bias_in, use_bias, seed_in = _prep(bias_p, num_heads, tokens, seed)
    use_pos = pos is not None
    pos_in = (pos_p.astype(jnp.float32) if use_pos
              else jnp.zeros((tokens, c), jnp.float32))

    tb = min(block_windows, bw)
    pad = (-bw) % tb
    if pad:
        zeros = jnp.zeros((pad, tokens, c), x.dtype)
        x = jnp.concatenate([x, zeros], axis=0)
        g = jnp.concatenate([g, jnp.zeros((pad, tokens, c), g.dtype)], axis=0)
    grid = (x.shape[0] // tb,)
    use_scale = scale is not None
    # the unused-case dummy is a jit-time constant; its per-call DMA is
    # ~48 KB (<1 us at HBM bandwidth) — not worth a second kernel
    # signature without the operand
    scale_in = (_scale_rows(scale, x.shape[0], tokens) if use_scale
                else jnp.ones((x.shape[0], tokens), jnp.float32))
    scale_spec = pl.BlockSpec((tb, tokens), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)

    mat, vec, seq, bias_spec, posspec = _ln_specs(c, num_heads, tokens, tb)
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel_ln, num_heads=num_heads, tokens=tokens,
                          use_bias=use_bias, use_pos=use_pos, rate=rate,
                          res=res, use_scale=use_scale),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),         # dx
            jax.ShapeDtypeStruct((c, c), f32),              # dwq
            jax.ShapeDtypeStruct((c,), f32),                # dbq
            jax.ShapeDtypeStruct((c, c), f32),              # dwk
            jax.ShapeDtypeStruct((c,), f32),                # dbk
            jax.ShapeDtypeStruct((c, c), f32),              # dwv
            jax.ShapeDtypeStruct((c,), f32),                # dbv
            jax.ShapeDtypeStruct((c, c), f32),              # dwo
            jax.ShapeDtypeStruct((c,), f32),                # dbo
            jax.ShapeDtypeStruct((c,), f32),                # dls
            jax.ShapeDtypeStruct((c,), f32),                # dlb
            jax.ShapeDtypeStruct((num_heads, tokens, tokens), f32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            seq(),
            mat(), vec(), mat(), vec(), mat(), vec(), mat(), vec(),
            vec(), vec(), posspec(), bias_spec(), scale_spec, seq(),
        ],
        out_specs=(seq(), mat(), vec(), mat(), vec(), mat(), vec(),
                   mat(), vec(), vec(), vec(), bias_spec()),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(seed_in, x, wq, bq, wk, bk, wv, bv, wo, bo,
      ls.astype(f32), lb.astype(f32), pos_in, bias_in, scale_in, g)
    dx = outs[0]
    if pad:
        dx = dx[:bw]
    if l_orig != tokens:
        dx = dx[:, :l_orig]
    dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo, dls, dlb, dbias = outs[1:]
    cast = lambda grad, ref: grad.astype(ref.dtype)
    grads = (dx, cast(dwq, wq), cast(dbq, bq), cast(dwk, wk), cast(dbk, bk),
             cast(dwv, wv), cast(dbv, bv), cast(dwo, wo), cast(dbo, bo),
             cast(dls, ls), cast(dlb, lb))
    dpos = jnp.zeros_like(pos) if pos is not None else None  # sine constants
    if bias is None:
        dbias_out = None
    else:
        dbias = dbias[:, :l_orig, :l_orig]
        if bias.shape[0] == 1:
            dbias_out = jnp.sum(dbias, axis=0,
                                keepdims=True).astype(bias.dtype)
        else:
            dbias_out = dbias.astype(bias.dtype)
    return grads + (dpos, dbias_out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16, 17, 18))
def fused_attention_ln(x, wq, bq, wk, bk, wv, bv, wo, bo, ls, lb, pos=None,
                       bias=None, seed=0, num_heads: int = 8,
                       dropout_rate: float = 0.0, block_windows: int = 64,
                       interpret: bool = False, block_windows_bwd: int = 32):
    """LN-folded fused attention sublayer over a single input (B, tokens, C).

    Computes out_proj(attn(q/k = LN(x) + pos, v = LN(x))) in one kernel per
    direction. ``ls``/``lb``: the LayerNorm affine (C,). ``pos``: optional
    non-learned (tokens, C) additive q/k position table (its cotangent is
    zero). ``bias``/``seed``/dropout as in :func:`fused_attention`. Token
    counts that are not sublane multiples are padded in-kernel.
    """
    return _fused_ln_forward(x, wq, bq, wk, bk, wv, bv, wo, bo, ls, lb, pos,
                             bias, seed, num_heads, dropout_rate,
                             block_windows, interpret)


def _ln_fwd(x, wq, bq, wk, bk, wv, bv, wo, bo, ls, lb, pos, bias, seed,
            num_heads, rate, block_windows, interpret, block_windows_bwd):
    out = _fused_ln_forward(x, wq, bq, wk, bk, wv, bv, wo, bo, ls, lb, pos,
                            bias, seed, num_heads, rate, block_windows,
                            interpret)
    return out, (x, wq, bq, wk, bk, wv, bv, wo, bo, ls, lb, pos, bias, seed)


def _ln_bwd(num_heads, rate, block_windows, interpret, block_windows_bwd,
            residuals, g):
    x, wq, bq, wk, bk, wv, bv, wo, bo, ls, lb, pos, bias, seed = residuals
    grads = _fused_ln_backward(x, wq, bq, wk, bk, wv, bv, wo, bo, ls, lb,
                               pos, bias, seed, g, num_heads, rate,
                               block_windows_bwd, interpret)
    dseed = np.zeros(jnp.shape(seed), jax.dtypes.float0)
    return grads + (dseed,)


fused_attention_ln.defvjp(_ln_fwd, _ln_bwd)


# ---------------------------------------------------------------------------
# Residual-folded variant: the ENTIRE pre-norm sublayer
#     out = x + scale * out_proj(attn(q/k = LN(x) + pos, v = LN(x)))
# in one kernel per direction. ``scale`` is the per-window DropPath factor
# (mask / keep, or None when inactive). The skip source x is already in VMEM
# for the LayerNorm, so folding the residual removes the XLA-side
# ``x + drop_path(y)`` — which reads both full tensors and writes a third —
# at the opaque kernel boundary, in both directions (backward's skip-path
# cotangent add happens in-kernel too). ``scale`` is treated as
# non-differentiable data (a dropout mask); its returned cotangent is zero.
# ---------------------------------------------------------------------------


def _reference_attention_ln_res(x, wq, bq, wk, bk, wv, bv, wo, bo, ls, lb,
                                pos, bias, scale, num_heads: int, keep=None,
                                rate: float = 0.0):
    """XLA oracle for the residual-folded sublayer."""
    y = _reference_attention_ln(x, wq, bq, wk, bk, wv, bv, wo, bo, ls, lb,
                                pos, bias, num_heads, keep=keep, rate=rate)
    y32 = y.astype(jnp.float32)
    if scale is not None:
        y32 = y32 * jnp.asarray(scale).astype(jnp.float32)[:, None, None]
    return (x.astype(jnp.float32) + y32).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17, 18, 19))
def fused_attention_ln_res(x, wq, bq, wk, bk, wv, bv, wo, bo, ls, lb,
                           pos=None, bias=None, scale=None, seed=0,
                           num_heads: int = 8, dropout_rate: float = 0.0,
                           block_windows: int = 64, interpret: bool = False,
                           block_windows_bwd: int = 32):
    """Residual-folded fused attention sublayer over (B, tokens, C).

    Computes ``x + scale * out_proj(attn(q/k=LN(x)+pos, v=LN(x)))`` in one
    kernel per direction. ``scale``: optional (B,) f32 per-window branch
    factor (the DropPath mask / keep-prob) — non-differentiable data, zero
    cotangent. Other args as :func:`fused_attention_ln`.
    """
    return _fused_ln_forward(x, wq, bq, wk, bk, wv, bv, wo, bo, ls, lb, pos,
                             bias, seed, num_heads, dropout_rate,
                             block_windows, interpret, scale=scale, res=True)


def _ln_res_fwd(x, wq, bq, wk, bk, wv, bv, wo, bo, ls, lb, pos, bias, scale,
                seed, num_heads, rate, block_windows, interpret,
                block_windows_bwd):
    out = _fused_ln_forward(x, wq, bq, wk, bk, wv, bv, wo, bo, ls, lb, pos,
                            bias, seed, num_heads, rate, block_windows,
                            interpret, scale=scale, res=True)
    return out, (x, wq, bq, wk, bk, wv, bv, wo, bo, ls, lb, pos, bias, scale,
                 seed)


def _ln_res_bwd(num_heads, rate, block_windows, interpret, block_windows_bwd,
                residuals, g):
    (x, wq, bq, wk, bk, wv, bv, wo, bo, ls, lb, pos, bias, scale,
     seed) = residuals
    grads = _fused_ln_backward(x, wq, bq, wk, bk, wv, bv, wo, bo, ls, lb,
                               pos, bias, seed, g, num_heads, rate,
                               block_windows_bwd, interpret, scale=scale,
                               res=True)
    # grads = (dx, dw/db x4, dls, dlb, dpos, dbias); insert dscale before
    # dseed (scale is a dropout mask, not a trained quantity)
    dscale = jnp.zeros_like(scale) if scale is not None else None
    dseed = np.zeros(jnp.shape(seed), jax.dtypes.float0)
    return grads + (dscale, dseed)


fused_attention_ln_res.defvjp(_ln_res_fwd, _ln_res_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15, 16))
def fused_attention(x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias, seed=0,
                    num_heads: int = 8, dropout_rate: float = 0.0,
                    block_windows: int = 64, interpret: bool = False,
                    block_windows_bwd: int = 32):
    """Fused short-sequence attention sublayer over (B, tokens, C).

    ``bias``: optional (heads | 1, tokens, tokens) additive logit bias —
    carries the RPE table and/or a causal mask (-1e30 upper triangle).
    ``seed``: int32 scalar for attention-weight dropout when
    ``dropout_rate > 0``. Fully differentiable; the backward is a fused
    Pallas kernel producing input, weight, and bias grads (smaller default
    tile: it holds ~3x the forward's VMEM working set).
    """
    return _fused_forward(x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias,
                          seed, num_heads, dropout_rate, block_windows,
                          interpret)


def _fwd(x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias, seed, num_heads,
         rate, block_windows, interpret, block_windows_bwd):
    out = _fused_forward(x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias,
                         seed, num_heads, rate, block_windows, interpret)
    return out, (x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias, seed)


def _bwd(num_heads, rate, block_windows, interpret, block_windows_bwd,
         residuals, g):
    x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias, seed = residuals
    grads = _fused_backward(x_qk, x_v, wq, bq, wk, bk, wv, bv, wo, bo, bias,
                            seed, g, num_heads, rate, block_windows_bwd,
                            interpret)
    dseed = np.zeros(jnp.shape(seed), jax.dtypes.float0)
    return grads + (dseed,)


fused_attention.defvjp(_fwd, _bwd)
