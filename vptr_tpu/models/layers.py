"""Core transformer layers: attention, conv-FFN, norms, stochastic depth.

Rebuilt TPU-first from the behaviors of the reference's custom attention stack
(reference: model/MultiHeadAttentionRPE.py, model/VidHRFormer_modules.py):

* All attention is batched einsum over static shapes — window attention runs
  as one (B*T*nWin, win^2, C) batch, never a Python loop.
* Softmax is computed in float32 regardless of compute dtype.
* Separate q/k/v projections (the reference's custom MHA also splits them,
  MultiHeadAttentionRPE.py:50-53).
* Relative position bias follows the Swin construction: a (2w-1)^2 x heads
  table gathered through a precomputed index (MultiHeadAttentionRPE.py:366-387).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vptr_tpu.ops.window import (
    pad_to_window,
    unpad_from_window,
    window_partition,
    window_reverse,
)

Dtype = Any


# sweep/measurement hook: when not None, overrides every MultiHeadAttention
# instance's fused_full_blocks (see MultiHeadAttention._ff_blocks)
FUSED_FULL_BLOCKS_OVERRIDE = None

# True routes rectangular (Lq != Lk) cross-attention to XLA even when
# fused=True. Default True BY MEASUREMENT (round 4, scripts/tpu_nar_bench_r04
# + results_r04/nar_bench.jsonl): in-step at the published nar_bair geometry
# XLA is 2.4% faster than the rectangular core kernel (155.09 vs 158.76
# ms/step), agreeing with the standalone probes (~1 ms slower at tiny Lk —
# at Lk=2..32 the XLA logits tensor is small enough that lane-padding
# traffic never dominates). Square (Lq == Lk) self-attention is unaffected
# and keeps the fused core. Set False to route rect shapes to the kernel
# (A/B hook; numerics are bit-equal either way at fwd). CAVEAT: read at
# TRACE time — flip it BEFORE constructing/jitting the Trainer or step;
# jit caches do not key on it, so flipping after a step has compiled
# silently keeps the old routing (scripts/tpu_nar_bench_r04.py builds a
# fresh Trainer per A/B row for exactly this reason).
FUSED_RECT_DISABLE = True

xavier_uniform = nn.initializers.xavier_uniform()
trunc_normal_002 = nn.initializers.truncated_normal(stddev=0.02)


class _DenseParams(nn.Module):
    """Parameter holder shaped exactly like ``nn.Dense`` ({kernel, bias}) so
    the fully-fused attention path shares checkpoints with the XLA path."""

    features: int
    kernel_init: Callable = xavier_uniform

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", self.kernel_init,
                            (in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class _LnScaleBias(nn.Module):
    """Parameter holder shaped exactly like ``nn.LayerNorm`` ({scale, bias})
    so the LN-folded fused attention path shares checkpoints with the
    XLA path (the block-level norm1/norm3 params stay at the block level)."""

    @nn.compact
    def __call__(self, dim: int):
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        return scale, bias


def layernorm_xla(x, scale, bias, dtype, epsilon: float = 1e-5):
    """nn.LayerNorm semantics from explicit affine arrays (f32 stats)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + epsilon)
    return (y * scale + bias).astype(dtype)


def relative_position_index(window: int) -> np.ndarray:
    """Precomputed (win^2, win^2) index into the (2w-1)^2 bias table.

    Mirrors the Swin-style construction (reference:
    MultiHeadAttentionRPE.py:373-387). Static numpy — baked into the jaxpr.
    """
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))          # (2, w, w)
    flat = coords.reshape(2, -1)                            # (2, w*w)
    rel = flat[:, :, None] - flat[:, None, :]               # (2, w*w, w*w)
    rel = rel.transpose(1, 2, 0)                            # (w*w, w*w, 2)
    rel[..., 0] += window - 1
    rel[..., 1] += window - 1
    rel[..., 0] *= 2 * window - 1
    return rel.sum(-1)                                      # (w*w, w*w)


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          bias: Optional[jnp.ndarray] = None,
                          mask: Optional[jnp.ndarray] = None,
                          dropout_rate: float = 0.0,
                          dropout_rng=None,
                          dtype: Dtype = jnp.float32) -> jnp.ndarray:
    """Attention over the second-to-last axis.

    q: (..., H, Lq, D), k/v: (..., H, Lk, D). ``bias`` broadcasts to
    (..., H, Lq, Lk); ``mask`` is boolean, True = masked out. Softmax in fp32.
    """
    depth = q.shape[-1]
    scale = depth ** -0.5
    logits = jnp.einsum("...qd,...kd->...qk", q * scale, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, jnp.float32(-1e30), logits)
    weights = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    weights.shape)
        weights = weights * keep / (1.0 - dropout_rate)
    weights = weights.astype(dtype)
    return jnp.einsum("...qk,...kd->...qd", weights, v,
                      preferred_element_type=jnp.float32).astype(dtype)


class MultiHeadAttention(nn.Module):
    """Generic MHA with separate q/k/v/out projections.

    Operates on (..., L, C) with arbitrary leading batch dims. Optional
    additive ``bias`` of shape (heads, Lq, Lk) and boolean ``mask`` (Lq, Lk).

    ``fused=True`` routes eligible self-attention calls (q/k/v of equal
    shape) through a Pallas fused kernel; ineligible calls fall back to the
    XLA path. Two fused flavors, both sharing this module's parameters:

    * ``fused_full=False`` — XLA Dense projections + the
      ``vptr_tpu.ops.attention_core`` fwd+bwd softmax-attention kernel.
    * ``fused_full=True``  — the whole sublayer (q/k/v/out projections +
      attention) in one ``vptr_tpu.ops.fused_window_attention`` kernel.

    Attention-weight dropout runs inside the kernel (counter-based TPU PRNG),
    so the fused paths are available under the reference parity config
    (attention dropout 0.1, MultiHeadAttentionRPE.py:547).
    """

    dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    kernel_init: Callable = xavier_uniform
    fused: bool = False
    fused_full: bool = False   # whole-sublayer kernel (projections included)
    fused_block: int = 64
    fused_full_blocks: tuple = (32, 16)   # (fwd, bwd) batch tiles for the
                               # projection-fused kernel — its bwd holds ~3x
                               # the fwd working set; 64/32 overflows VMEM at
                               # d_model 528 and stalls the Mosaic compile
    remat_core: bool = False   # measured neutral on v5e at batch 10; saves
                               # HBM at larger batch (padded logit residuals)

    def _ff_blocks(self) -> tuple:
        # measurement hook: FUSED_FULL_BLOCKS_OVERRIDE (module global) wins
        # over the field. Flax dataclass field defaults bind at class
        # creation, so assigning MultiHeadAttention.fused_full_blocks after
        # import is a silent no-op — sweeps must set the global instead.
        return (FUSED_FULL_BLOCKS_OVERRIDE
                if FUSED_FULL_BLOCKS_OVERRIDE is not None
                else self.fused_full_blocks)

    @nn.compact
    def __call__(self, q_in, k_in, v_in, *, bias=None, mask=None, ln=None,
                 qk_pos=None, deterministic: bool = True,
                 residual: bool = False, branch_scale=None):
        """``ln``: optional (scale, bias) of the sublayer's leading
        LayerNorm — callers then pass the RAW (pre-norm) x as q_in=k_in=v_in
        and the module computes q/k = LN(x) + qk_pos, v = LN(x). On the
        fully-fused path the norm runs inside the Pallas kernel (an XLA-side
        LN cannot fuse across the opaque kernel boundary); other paths apply
        it in XLA first. ``qk_pos``: optional non-learned (L, C) position
        table added to q/k only.

        ``residual=True`` (requires ``ln``) changes the contract: the module
        returns the FULL pre-norm sublayer ``x + branch_scale * attn(...)``
        — on the fully-fused path the residual add (and the per-window
        DropPath factor ``branch_scale``, shape (leading batch,) f32) runs
        inside the kernel; fallback paths apply it in XLA."""
        assert self.dim % self.num_heads == 0
        hd = self.dim // self.num_heads
        assert not residual or ln is not None, "residual=True requires ln"
        x_raw = q_in

        def with_residual(y):
            if not residual:
                return y
            y32 = y.astype(jnp.float32)
            if branch_scale is not None:
                s = branch_scale.astype(jnp.float32)
                y32 = y32 * s.reshape(s.shape + (1,) * (y.ndim - 1))
            return (x_raw.astype(jnp.float32) + y32).astype(y.dtype)

        def full_bias_of(bias, mask):
            if mask is None:
                return bias
            mbias = jnp.where(mask, jnp.float32(-1e30), jnp.float32(0.0))
            mbias = mbias[None]  # (1, L, L)
            return (mbias if bias is None
                    else bias.astype(jnp.float32) + mbias)

        def dropout_seed(rate):
            if rate == 0.0:
                return jnp.int32(0)
            return jax.random.randint(self.make_rng("dropout"), (), 0,
                                      jnp.iinfo(jnp.int32).max,
                                      dtype=jnp.int32)

        def dense_params():
            params = [_DenseParams(self.dim, self.kernel_init, name=n)(
                self.dim) for n in ("q_proj", "k_proj", "v_proj", "out_proj")]
            return [(w.astype(self.dtype), b.astype(jnp.float32))
                    for w, b in params]

        if ln is not None:
            assert q_in is k_in and k_in is v_in, \
                "ln folding expects the raw x as q_in = k_in = v_in"
            if (self.fused and self.fused_full and
                    q_in.shape[-1] == self.dim):
                from vptr_tpu.ops.fused_window_attention import (
                    fused_attention_ln,
                    fused_attention_ln_res,
                )

                rate = 0.0 if deterministic else self.dropout
                (wq, bq), (wk, bk), (wv, bv), (wo, bo) = dense_params()
                lead, l = q_in.shape[:-2], q_in.shape[-2]
                common = (wq, bq, wk, bk, wv, bv, wo, bo, ln[0], ln[1],
                          (qk_pos.astype(jnp.float32)
                           if qk_pos is not None else None),
                          full_bias_of(bias, mask))
                xf = q_in.reshape((-1, l, self.dim)).astype(self.dtype)
                ffb = self._ff_blocks()
                if residual:
                    out = fused_attention_ln_res(
                        xf, *common, branch_scale, dropout_seed(rate),
                        self.num_heads, rate, ffb[0],
                        jax.default_backend() != "tpu", ffb[1])
                else:
                    out = fused_attention_ln(
                        xf, *common, dropout_seed(rate),
                        self.num_heads, rate, ffb[0],
                        jax.default_backend() != "tpu", ffb[1])
                return out.reshape(lead + (l, self.dim))
            # non-folded paths: materialize the norm in XLA, continue below
            xn = layernorm_xla(q_in, ln[0], ln[1], self.dtype)
            q_in = k_in = (xn + qk_pos.astype(xn.dtype)
                           if qk_pos is not None else xn)
            v_in = xn

        # the projection-fused kernel merges (tiles, tokens, C) -> 2D for its
        # full-width GEMMs; when the token count is not a sublane-tile
        # multiple (bf16: 16, f32: 8) the ops layer pads it in (masked
        # softmax columns), so e.g. the T=19 temporal attention runs fully
        # fused at T=32 instead of falling back to the core kernel.
        use_full = (self.fused and self.fused_full and q_in is k_in and
                    v_in.shape == q_in.shape and
                    q_in.shape[-1] == self.dim)
        if use_full:
            from vptr_tpu.ops.fused_window_attention import fused_attention

            rate = 0.0 if deterministic else self.dropout
            (wq, bq), (wk, bk), (wv, bv), (wo, bo) = dense_params()
            lead = q_in.shape[:-2]
            l = q_in.shape[-2]
            flat = lambda z: z.reshape((-1, l, self.dim)).astype(self.dtype)
            out = fused_attention(
                flat(q_in), flat(v_in), wq, bq, wk, bk, wv, bv, wo, bo,
                full_bias_of(bias, mask), dropout_seed(rate),
                self.num_heads, rate, self._ff_blocks()[0],
                jax.default_backend() != "tpu", self._ff_blocks()[1])
            return with_residual(out.reshape(lead + (l, self.dim)))

        dense = lambda name: nn.Dense(self.dim, dtype=self.dtype,
                                      kernel_init=self.kernel_init,
                                      bias_init=nn.initializers.zeros,
                                      name=name)
        q = dense("q_proj")(q_in)
        k = dense("k_proj")(k_in)
        v = dense("v_proj")(v_in)

        def split(x):  # (..., L, C) -> (..., H, L, D)
            x = x.reshape(x.shape[:-1] + (self.num_heads, hd))
            return jnp.moveaxis(x, -2, -3)

        q, k, v = split(q), split(k), split(v)

        # rectangular (Lq != Lk) cross-attention is kernel-eligible too:
        # only the leading batch/head dims and the head depth must agree
        use_fused = (self.fused and k.shape == v.shape and
                     q.shape[:-2] == k.shape[:-2] and
                     q.shape[-1] == k.shape[-1] and
                     (q.shape[-2] == k.shape[-2] or not FUSED_RECT_DISABLE))
        if use_fused:
            from vptr_tpu.ops.attention_core import attention_core

            rate = 0.0 if deterministic else self.dropout
            lead = q.shape[:-3]
            h, lq, lk = q.shape[-3], q.shape[-2], k.shape[-2]
            flat = lambda z, l: z.reshape((-1, h, l, hd))
            out = attention_core(flat(q, lq), flat(k, lk), flat(v, lk),
                                 full_bias_of(bias, mask),
                                 dropout_seed(rate), rate, self.fused_block,
                                 jax.default_backend() != "tpu")
            out = out.reshape(lead + (h, lq, hd))
        else:
            drop_rng = None
            if self.dropout > 0.0 and not deterministic:
                drop_rng = self.make_rng("dropout")
            attn = dot_product_attention
            if self.remat_core and drop_rng is None:
                # recompute the (T, T) logits/weights in backward instead of
                # saving them: XLA pads trailing (T, T) dims ~8x to lane
                # tiles, so the saved buffers cost far more HBM than the
                # recompute (measured on v5e; see CLAUDE.md)
                attn = jax.checkpoint(
                    lambda q, k, v, bias, mask: dot_product_attention(
                        q, k, v, bias=bias, mask=mask, dtype=self.dtype),
                    static_argnums=())
                out = attn(q, k, v, bias, mask)
            else:
                out = attn(q, k, v, bias=bias, mask=mask,
                           dropout_rate=self.dropout,
                           dropout_rng=drop_rng, dtype=self.dtype)
        out = jnp.moveaxis(out, -3, -2)
        out = out.reshape(out.shape[:-2] + (self.dim,))
        return with_residual(dense("out_proj")(out))


class WindowAttention(nn.Module):
    """Local spatial window self-attention over (N, T, H, W, C).

    Absolute mode adds a 2D sine embedding to the q/k inputs pre-projection;
    RPE mode adds a learned relative bias to the logits instead
    (reference: VidHRFormer_modules.py:321-357 + MultiHeadAttentionRPE.py:629-650).
    ``value`` may differ from ``x`` (NAR decoder self-attention separates the
    query-pos-augmented q/k from the raw value, VidHRFormer_modules.py:176-178).
    """

    dim: int
    num_heads: int
    window: int = 4
    dropout: float = 0.0
    rpe: bool = False
    fused: bool = False
    fused_full: bool = False
    fused_full_blocks: tuple = (32, 16)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos2d, *, value=None, ln=None,
                 deterministic: bool = True, residual: bool = False,
                 branch_scale=None):
        """``ln``: optional (scale, bias) of the block's leading LayerNorm —
        pass the RAW pre-norm x then; the norm folds into the fused kernel
        (or runs in XLA on fallback paths). Requires ``value is None``.

        ``residual=True`` (requires ``ln``) returns the FULL sublayer
        ``x + branch_scale * attn(...)`` with the residual add (and the
        per-frame DropPath factor ``branch_scale``, shape (N*T,) f32)
        folded into the fused kernel."""
        n, t, h, w, c = x.shape
        tokens = self.window * self.window

        bias = None
        if self.rpe:
            table = self.param(
                "rpe_table", trunc_normal_002,
                ((2 * self.window - 1) ** 2, self.num_heads), jnp.float32)
            idx = relative_position_index(self.window).reshape(-1)
            bias = table[idx].reshape(tokens, tokens, self.num_heads)
            bias = bias.transpose(2, 0, 1)  # (heads, L, L)

        def to_windows(y):
            y = y.reshape(n * t, h, w, c)
            y, offs = pad_to_window(y, self.window)
            return window_partition(y, self.window), offs, y.shape[1:3]

        xw, offs, padded_hw = to_windows(x)
        mha = MultiHeadAttention(self.dim, self.num_heads, self.dropout,
                                 dtype=self.dtype, fused=self.fused,
                                 fused_full=self.fused_full,
                                 fused_full_blocks=tuple(self.fused_full_blocks),
                                 name="attn")
        if ln is not None:
            assert value is None, "ln folding requires value is None"
            qk_pos = None if self.rpe else pos2d.reshape(tokens, c)
            win_scale = None
            if residual and branch_scale is not None:
                # per-frame DropPath factor -> per-window (windows are
                # frame-major in window_partition order)
                wins_per_frame = xw.shape[0] // (n * t)
                win_scale = jnp.repeat(branch_scale.astype(jnp.float32),
                                       wins_per_frame)
            out = mha(xw, xw, xw, bias=bias, ln=ln, qk_pos=qk_pos,
                      deterministic=deterministic, residual=residual,
                      branch_scale=win_scale)
        else:
            if self.rpe:
                qk_in = xw
            else:
                qk_in = xw + pos2d.reshape(1, tokens, c).astype(xw.dtype)
            if value is None:
                vw = xw
            else:
                vw, _, _ = to_windows(value)
            out = mha(qk_in, qk_in, vw, bias=bias,
                      deterministic=deterministic)
        out = window_reverse(out, self.window, padded_hw)
        out = unpad_from_window(out, (h, w), offs)
        return out.reshape(n, t, h, w, c)


class TemporalAttention(nn.Module):
    """Full attention over the time axis, factored per spatial location.

    Input (N, T, H, W, C); every (n, h, w) column attends over its T tokens
    (reference: VidHRFormer_modules.py:74-84 reshapes to (T, N*H*W, C)).
    A static causal mask implements the FAR variant — built at trace time,
    not per step on host like the reference (VidHRFormer_modules.py:78-82).
    Cross-attention: pass ``kv`` (N, Tk, H, W, C) and per-axis pos embeds.
    """

    dim: int
    num_heads: int
    dropout: float = 0.0
    causal: bool = False
    fused: bool = False
    fused_full: bool = False
    fused_full_blocks: tuple = (32, 16)
    sp: bool = False        # sequence parallel: shard the (H*W) column axis
                            # over the 'model' mesh axis (GSPMD inserts the
                            # collectives). Composes with head TP on the same
                            # axis: GSPMD reshards activations between the
                            # column-sharded and head-sharded layouts, with
                            # numerics unchanged (test_parallel.py::
                            # test_sp_plus_tp_matches_baseline; dryrun_
                            # multichip runs this composition). TP targets
                            # param/optimizer HBM + GEMM FLOPs, SP targets
                            # temporal-attention activation HBM — the extra
                            # reshard collectives only pay off at larger
                            # geometries (see PARITY.md collective counts)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_q, *, kv=None, pos_k=None, ln=None,
                 deterministic: bool = True):
        """``ln``: optional (scale, bias) — pass RAW pre-norm x; the norm
        folds into the fused kernel (self-attention only, ``kv is None``)."""
        n, t, h, w, c = x.shape
        # (N, T, H, W, C) -> (N, H*W, T, C): batch over columns, attend over T.
        def cols(y):
            yn, yt, yh, yw, yc = y.shape
            return y.transpose(0, 2, 3, 1, 4).reshape(yn, yh * yw, yt, yc)

        def sp_shard(y):
            if not self.sp:
                return y
            from jax.sharding import PartitionSpec as P

            # (N, HW, T, C): token columns sharded over 'model'. The batch
            # axis must stay UNCONSTRAINED (keeps the caller's 'data'
            # sharding): a None entry in a sharding constraint means
            # "replicated" — round 1 shipped P(None, 'model', ...) and GSPMD
            # dutifully all-gathered the data-sharded batch on every
            # constraint ("involuntary full rematerialization" warnings,
            # MULTICHIP_r01). An explicit 'data' would instead reject ragged
            # eval batches (divisibility check).
            return jax.lax.with_sharding_constraint(
                y, P(P.UNCONSTRAINED, "model", None, None))

        mask = None
        if self.causal and kv is None:
            mask = np.triu(np.ones((t, t), dtype=bool), k=1)
            mask = jnp.asarray(mask)

        mha = MultiHeadAttention(self.dim, self.num_heads, self.dropout,
                                 dtype=self.dtype, fused=self.fused,
                                 fused_full=self.fused_full,
                                 fused_full_blocks=tuple(self.fused_full_blocks),
                                 name="attn")
        if ln is not None:
            assert kv is None, "ln folding requires self-attention (kv=None)"
            xc = sp_shard(cols(x))
            out = mha(xc, xc, xc, mask=mask, ln=ln, qk_pos=pos_q,
                      deterministic=deterministic)
            return out.reshape(n, h, w, t, c).transpose(0, 3, 1, 2, 4)

        q_in = sp_shard(cols(x) + pos_q[None, None, :, :].astype(x.dtype))
        if kv is None:
            k_in, v_in = q_in, sp_shard(cols(x))
        else:
            kcols = cols(kv)
            k_in = sp_shard(kcols + pos_k[None, None, :, :].astype(x.dtype))
            v_in = sp_shard(kcols)

        out = mha(q_in, k_in, v_in, mask=mask, deterministic=deterministic)
        return out.reshape(n, h, w, t, c).transpose(0, 3, 1, 2, 4)


class LayerNormHWC(nn.Module):
    """LayerNorm over the full (H, W, C) feature map with per-element affine.

    Equivalent to torch ``nn.LayerNorm((C, H, W))`` on NCHW input
    (reference: VidHRFormer_modules.py:398,411,417) — normalizes each sample
    over all H*W*C values. Shape-bound to the latent geometry, as upstream.
    """

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (..., H, W, C)
        shape = x.shape[-3:]
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(-3, -2, -1), keepdims=True)
        var = jnp.var(x32, axis=(-3, -2, -1), keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, shape, jnp.float32)
        return (y * scale + bias).astype(self.dtype)


class _ConvParams(nn.Module):
    """Parameter holder shaped exactly like a 1x1 ``nn.Conv`` so the fused
    conv+LN path shares checkpoints with the XLA path."""

    features: int
    kernel_init: Callable = xavier_uniform

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", self.kernel_init,
                            (1, 1, in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class _LnHwcParams(nn.Module):
    """Parameter holder shaped exactly like ``LayerNormHWC``."""

    shape: tuple

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, self.shape,
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, self.shape,
                          jnp.float32)
        return scale, bias


class _DwConvParams(nn.Module):
    """Parameter holder shaped exactly like the depthwise 3x3 ``nn.Conv``
    ({kernel (3, 3, 1, C), bias (C,)}) so the fused dw-chain path shares
    checkpoints with the XLA path."""

    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", xavier_uniform,
                            (3, 3, 1, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class MlpDWBN(nn.Module):
    """HRFormer conv feed-forward: 1x1 -> norm -> GELU -> 3x3 depthwise ->
    norm -> GELU -> drop -> 1x1 -> norm -> GELU -> drop.

    (reference: VidHRFormer_modules.py:376-442.) ``norm='layer'`` uses the
    shape-bound LayerNorm over (H, W, C) (torch LayerNorm((C,H,W)));
    ``norm='batch'`` uses BatchNorm2d semantics. GELU is exact (erf), matching
    torch nn.GELU.

    ``fused_ln=True`` (layer-norm flavor only) runs the fc1 and fc2 stages
    through the Pallas ``conv_ln_gelu`` kernel — GEMM, whole-sample norm
    stats, affine, and GELU in one VMEM pass instead of ~3 HBM round-trips
    at the 4x-hidden width. Same parameter tree as the XLA path.
    """

    dim: int
    hidden_dim: int
    norm: str = "layer"               # layer | batch
    dropout: float = 0.0
    fused_ln: bool = False
    fused_dw: bool = False            # Pallas fused norm1+GELU+dw3x3+norm2+
                                      # GELU+drop between the 1x1 GEMMs
                                      # (layer-norm flavor only)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, train: bool = False):
        n, t, h, w, c = x.shape
        y = x.reshape(n * t, h, w, c)

        def norm(tag, z):
            if self.norm == "layer":
                return LayerNormHWC(dtype=self.dtype, name=f"norm{tag}")(z)
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype,
                                name=f"norm{tag}")(z)

        gelu = lambda z: jax.nn.gelu(z, approximate=False)
        drop = nn.Dropout(self.dropout, deterministic=deterministic)

        if self.norm == "layer" and self.fused_dw:
            from vptr_tpu.ops.fused_dw_chain import fused_dw_chain

            hd = self.hidden_dim
            y = nn.Conv(hd, (1, 1), dtype=self.dtype,
                        kernel_init=xavier_uniform, name="fc1")(y)
            s1, b1 = _LnHwcParams((h, w, hd), name="norm1")()
            s2, b2 = _LnHwcParams((h, w, hd), name="norm2")()
            dwk, dwb = _DwConvParams(hd, name="dw3x3")()
            rate = 0.0 if deterministic else self.dropout
            if rate > 0.0:
                seed = jax.random.randint(self.make_rng("dropout"), (), 0,
                                          jnp.iinfo(jnp.int32).max,
                                          dtype=jnp.int32)
            else:
                seed = jnp.int32(0)
            y = fused_dw_chain(
                y.reshape(n * t, h * w, hd),
                dwk.reshape(9, hd), dwb,
                s1.reshape(h * w, hd), b1.reshape(h * w, hd),
                s2.reshape(h * w, hd), b2.reshape(h * w, hd),
                seed, w, rate, 8, jax.default_backend() != "tpu")
            y = y.reshape(n * t, h, w, hd)
            y = nn.Conv(self.dim, (1, 1), dtype=self.dtype,
                        kernel_init=xavier_uniform, name="fc2")(y)
            y = drop(gelu(norm(3, y)))
            return y.reshape(n, t, h, w, self.dim)

        if self.norm == "layer" and self.fused_ln:
            from vptr_tpu.ops.fused_conv_ln import conv_ln_gelu

            interpret = jax.default_backend() != "tpu"

            def fused_stage(conv_name, norm_name, z, cout):
                cin = z.shape[-1]
                kernel, b = _ConvParams(cout, name=conv_name)(cin)
                scale, bias2 = _LnHwcParams((h, w, cout), name=norm_name)()
                out = conv_ln_gelu(
                    z.reshape(n * t, h * w, cin),
                    kernel.reshape(cin, cout).astype(self.dtype),
                    b.astype(jnp.float32),
                    scale.reshape(h * w, cout), bias2.reshape(h * w, cout),
                    1e-5, interpret)
                return out.reshape(n * t, h, w, cout)

            y = fused_stage("fc1", "norm1", y, self.hidden_dim)
            y = nn.Conv(self.hidden_dim, (3, 3), padding=1,
                        feature_group_count=self.hidden_dim,
                        dtype=self.dtype, kernel_init=xavier_uniform,
                        name="dw3x3")(y)
            y = drop(gelu(norm(2, y)))
            y = drop(fused_stage("fc2", "norm3", y, self.dim))
            return y.reshape(n, t, h, w, self.dim)

        y = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype,
                    kernel_init=xavier_uniform, name="fc1")(y)
        y = gelu(norm(1, y))
        y = nn.Conv(self.hidden_dim, (3, 3), padding=1,
                    feature_group_count=self.hidden_dim, dtype=self.dtype,
                    kernel_init=xavier_uniform, name="dw3x3")(y)
        y = drop(gelu(norm(2, y)))
        y = nn.Conv(self.dim, (1, 1), dtype=self.dtype,
                    kernel_init=xavier_uniform, name="fc2")(y)
        y = drop(gelu(norm(3, y)))
        return y.reshape(n, t, h, w, self.dim)


class DropPath(nn.Module):
    """Stochastic depth — drop the whole residual branch per sample
    (reference: VidHRFormer_modules.py:563-592)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Mlp(nn.Module):
    """Plain linear FFN: Linear -> GELU -> drop -> Linear
    (reference: VidHRFormer_modules.py:50-55,88-90 —
    ``linear2(drop2(gelu(linear1(x))))``; the post-linear2 dropout is the
    BLOCK's outer drop3 on the residual branch, applied by the caller.
    A previous revision also dropped inside this module, double-dropping
    the FFN output in train mode)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0
    fused: bool = False     # Pallas fused LN+FFN kernel (requires ``ln``)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, ln=None, deterministic: bool = True):
        """``ln``: optional (scale, bias) of the sublayer's leading
        LayerNorm (norm4) — pass the RAW pre-norm x then. With ``fused``
        the whole norm+fc1+GELU+dropout+fc2 chain runs in one Pallas
        kernel per direction; otherwise the norm is applied in XLA here."""
        if ln is not None and self.fused:
            from vptr_tpu.ops.fused_ffn import fused_ffn

            w1, b1 = _DenseParams(self.hidden_dim, xavier_uniform,
                                  name="linear1")(self.dim)
            w2, b2 = _DenseParams(self.dim, xavier_uniform,
                                  name="linear2")(self.hidden_dim)
            rate = 0.0 if deterministic else self.dropout
            if rate > 0.0:
                seed = jax.random.randint(self.make_rng("dropout"), (), 0,
                                          jnp.iinfo(jnp.int32).max,
                                          dtype=jnp.int32)
            else:
                seed = jnp.int32(0)
            lead = x.shape[:-1]
            out = fused_ffn(
                x.reshape(-1, self.dim).astype(self.dtype),
                w1.astype(self.dtype), b1.astype(jnp.float32),
                w2.astype(self.dtype), b2.astype(jnp.float32),
                ln[0], ln[1], seed, rate, 256,
                jax.default_backend() != "tpu", 128)
            return out.reshape(lead + (self.dim,))
        if ln is not None:
            x = layernorm_xla(x, ln[0], ln[1], self.dtype)
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        y = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     kernel_init=xavier_uniform, name="linear1")(x)
        y = drop(jax.nn.gelu(y, approximate=False))
        return nn.Dense(self.dim, dtype=self.dtype,
                        kernel_init=xavier_uniform, name="linear2")(y)
