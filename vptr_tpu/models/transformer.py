"""VidHRFormer latent video transformer — FAR and NAR variants.

Capability parity with the reference transformer stack
(reference: model/VidHRFormer.py, model/VidHRFormer_modules.py,
model/VPTR_modules.py:98-197), redesigned for XLA:

* One block = window spatial attention -> conv FFN -> factored temporal
  attention -> linear FFN (pre-norm, residual, stochastic depth)
  (reference: VidHRFormer_modules.py:30-93).
* FAR: encoder-only with a static causal temporal mask (the reference builds
  the mask on host per forward, VidHRFormer_modules.py:78-82 — here it is a
  trace-time constant).
* NAR: encoder over past + decoder over learned frame queries, with either
  full temporal enc-dec attention or TSLMA windowed spatio-temporal attention
  (reference: VidHRFormer_modules.py:125-211).
* All sine position embeddings are trace-time constants (no device pinning).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vptr_tpu.models.layers import (
    DropPath,
    Mlp,
    MlpDWBN,
    MultiHeadAttention,
    TemporalAttention,
    WindowAttention,
    _LnScaleBias,
    xavier_uniform,
)
from vptr_tpu.models.position import (
    position_embedding_1d,
    position_embedding_2d,
    position_embedding_3d,
)
from vptr_tpu.ops.window import temporal_window_partition, temporal_window_reverse

Dtype = Any


class EncoderBlock(nn.Module):
    """VidHRFormerBlockEnc (reference: VidHRFormer_modules.py:30-93)."""

    dim: int
    num_heads: int
    window: int = 4
    dropout: float = 0.0
    drop_path: float = 0.0
    attn_dropout: Optional[float] = None   # None -> dropout
    ffn_hidden_ratio: int = 4
    dim_feedforward: int = 2112
    far: bool = False                  # causal temporal mask + LayerNorm conv-FFN
    rpe: bool = False
    fused_attention: bool = False
    fused_full: bool = False           # fully-fused sublayer (projections in-kernel)
    fused_full_blocks: tuple = (32, 16)  # (fwd, bwd) kernel batch tiles
    fused_full_temporal: bool = False  # extend full fusion to the temporal
                                       # sublayer (padded tokens; measured
                                       # ~neutral on v5e — see BENCH_NOTES)
    fused_residual: bool = False       # fold the window sublayer's residual
                                       # add + DropPath into the fused kernel
    fused_ffn: bool = False            # Pallas LN+fc1+GELU+drop+fc2 kernel
                                       # for the linear FFN sublayer
    fused_dw: bool = False             # Pallas fused norm1+GELU+dw3x3+norm2+
                                       # GELU+drop inside the conv FFN
    fused_conv_ffn: bool = False       # Pallas conv+LN+GELU for fc1/fc2
    sequence_parallel: bool = False
    conv_ffn_norm: Optional[str] = None  # override; default: layer if far else batch
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos2d, pos_t, train: bool = False,
                 deterministic: bool = True):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        dp = DropPath(self.drop_path)
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        ffn_norm = self.conv_ffn_norm or ("layer" if self.far else "batch")
        attn_drop = (self.dropout if self.attn_dropout is None
                     else self.attn_dropout)
        # fully-fused path: fold the attention sublayers' leading LayerNorms
        # into the Pallas kernels (param tree unchanged — norm1/norm3 stay
        # {scale, bias} at the block level)
        fold = self.fused_attention and self.fused_full

        # 1) local-window spatial self-attention
        wa = WindowAttention(self.dim, self.num_heads, self.window,
                             attn_drop, rpe=self.rpe,
                             fused=self.fused_attention,
                             fused_full=self.fused_full,
                             fused_full_blocks=self.fused_full_blocks,
                             dtype=self.dtype,
                             name="slmhsa")
        if fold and self.fused_residual:
            # residual + DropPath fold into the kernel. The DropPath draw
            # uses the same per-clip bernoulli semantics as the DropPath
            # module, but a separate rng stream (documented in BENCH_NOTES).
            scale = None
            if not deterministic and self.drop_path > 0.0:
                keep = 1.0 - self.drop_path
                mask = jax.random.bernoulli(self.make_rng("dropout"), keep,
                                            (x.shape[0],))
                scale = jnp.repeat((mask / keep).astype(jnp.float32),
                                   x.shape[1])
            x = wa(x, pos2d, ln=_LnScaleBias(name="norm1")(self.dim),
                   residual=True, branch_scale=scale,
                   deterministic=deterministic)
        elif fold:
            y = wa(x, pos2d, ln=_LnScaleBias(name="norm1")(self.dim),
                   deterministic=deterministic)
            x = x + dp(y, deterministic=deterministic)
        else:
            y = wa(ln("norm1")(x), pos2d, deterministic=deterministic)
            x = x + dp(y, deterministic=deterministic)

        # 2) conv feed-forward (cross-window mixing)
        y = MlpDWBN(self.dim, self.ffn_hidden_ratio * self.dim, norm=ffn_norm,
                    dropout=self.dropout, fused_ln=self.fused_conv_ffn,
                    fused_dw=self.fused_dw,
                    dtype=self.dtype, name="spatial_ffn")(
            ln("norm2")(x), deterministic=deterministic, train=train)
        x = x + dp(y, deterministic=deterministic)

        # 3) temporal attention per spatial location. Full fusion here is
        #    opt-in (fused_full_temporal): the in-kernel token padding
        #    (e.g. 19 -> 32) wastes projection FLOPs that roughly cancel
        #    the fusion win on v5e, so the default fully-fused config keeps
        #    temporal on the attention-core kernel with an XLA LayerNorm.
        fold_t = fold and self.fused_full_temporal
        ta = TemporalAttention(self.dim, self.num_heads, attn_drop,
                               causal=self.far, fused=self.fused_attention,
                               fused_full=fold_t,
                               fused_full_blocks=self.fused_full_blocks,
                               sp=self.sequence_parallel,
                               dtype=self.dtype, name="temporal")
        if fold_t:
            y = ta(x, pos_t, ln=_LnScaleBias(name="norm3")(self.dim),
                   deterministic=deterministic)
        else:
            y = ta(ln("norm3")(x), pos_t, deterministic=deterministic)
        x = x + drop(y)

        # 4) linear feed-forward
        mlp = Mlp(self.dim, self.dim_feedforward, self.dropout,
                  fused=self.fused_ffn, dtype=self.dtype, name="ffn")
        if self.fused_ffn:
            y = mlp(x, ln=_LnScaleBias(name="norm4")(self.dim),
                    deterministic=deterministic)
        else:
            y = mlp(ln("norm4")(x), deterministic=deterministic)
        return x + drop(y)


class DecoderBlockNAR(nn.Module):
    """VidHRFormerBlockDecNAR (reference: VidHRFormer_modules.py:125-211).

    ``fused_residual`` is accepted for config uniformity with EncoderBlock
    but intentionally unused: the decoder's window self-attention separates
    the query-pos-augmented q/k from the raw value (sublayer 1 below), which
    the residual-folding kernel path does not support (it requires
    q_in = k_in = v_in). The flag therefore only affects encoder blocks —
    noted at the config field too (config.py ``fused_residual``)."""

    dim: int
    num_heads: int
    window: int = 4
    dropout: float = 0.0
    drop_path: float = 0.0
    attn_dropout: Optional[float] = None   # None -> dropout
    ffn_hidden_ratio: int = 4
    dim_feedforward: int = 2112
    tslma: bool = False
    rpe: bool = False
    fused_attention: bool = False
    fused_full: bool = False
    fused_full_blocks: tuple = (32, 16)
    fused_full_temporal: bool = False
    fused_residual: bool = False
    fused_ffn: bool = False
    fused_dw: bool = False
    fused_conv_ffn: bool = False
    sequence_parallel: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos, memory, pos2d, pos_t_future,
                 pos_t_past, pos3d, train: bool = False,
                 deterministic: bool = True):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        dp = DropPath(self.drop_path)
        drop = nn.Dropout(self.dropout, deterministic=deterministic)

        attn_drop = (self.dropout if self.attn_dropout is None
                     else self.attn_dropout)
        # 1) window self-attention on queries: q/k carry query_pos, value not
        #    (reference: VidHRFormer_modules.py:176-178)
        t2 = ln("norm1")(tgt)
        y = WindowAttention(self.dim, self.num_heads, self.window,
                            attn_drop, rpe=self.rpe,
                            fused=self.fused_attention,
                            fused_full=self.fused_full,
                            fused_full_blocks=self.fused_full_blocks,
                            dtype=self.dtype,
                            name="slmhsa")(
            t2 + query_pos, pos2d, value=t2, deterministic=deterministic)
        tgt = tgt + dp(y, deterministic=deterministic)

        # 2) conv FFN (LayerNorm flavor: AR_model default True,
        #    VidHRFormer_modules.py:390)
        y = MlpDWBN(self.dim, self.ffn_hidden_ratio * self.dim, norm="layer",
                    dropout=self.dropout, fused_ln=self.fused_conv_ffn,
                    fused_dw=self.fused_dw,
                    dtype=self.dtype, name="spatial_ffn")(
            ln("norm2")(tgt), deterministic=deterministic, train=train)
        tgt = tgt + dp(y, deterministic=deterministic)

        # 3) temporal self-attention over the Tf query frames (same
        #    fused_full_temporal opt-in as the encoder block)
        fold_t = (self.fused_attention and self.fused_full
                  and self.fused_full_temporal)
        ta = TemporalAttention(self.dim, self.num_heads, attn_drop,
                               fused=self.fused_attention,
                               fused_full=fold_t,
                               fused_full_blocks=self.fused_full_blocks,
                               sp=self.sequence_parallel, dtype=self.dtype,
                               name="temporal")
        if fold_t:
            y = ta(tgt, pos_t_future,
                   ln=_LnScaleBias(name="norm3")(self.dim),
                   deterministic=deterministic)
        else:
            y = ta(ln("norm3")(tgt), pos_t_future,
                   deterministic=deterministic)
        tgt = tgt + drop(y)

        # 4) linear FFN
        mlp = Mlp(self.dim, self.dim_feedforward, self.dropout,
                  fused=self.fused_ffn, dtype=self.dtype, name="ffn")
        if self.fused_ffn:
            y = mlp(tgt, ln=_LnScaleBias(name="norm4")(self.dim),
                    deterministic=deterministic)
        else:
            y = mlp(ln("norm4")(tgt), deterministic=deterministic)
        tgt = tgt + drop(y)

        # 5) encoder-decoder attention
        t5 = ln("norm5")(tgt)
        if self.tslma:
            y = TSLMA(self.dim, self.num_heads, self.window, self.dropout,
                      fused=self.fused_attention, dtype=self.dtype,
                      name="tslma")(
                memory, t5 + query_pos, pos3d, deterministic=deterministic)
        else:
            # full attention over time, per spatial location; query carries
            # query_pos + future temporal pos (VidHRFormer_modules.py:200-206)
            # (the fused core kernel is rectangular — it applies at Tp != Tf
            # too, e.g. the published BAIR 2 -> 10 geometry)
            y = TemporalAttention(self.dim, self.num_heads, attn_drop,
                                  fused=self.fused_attention,
                                  sp=self.sequence_parallel,
                                  dtype=self.dtype, name="enc_dec")(
                t5 + query_pos, pos_t_future, kv=memory, pos_k=pos_t_past,
                deterministic=deterministic)
        tgt = tgt + dp(y, deterministic=deterministic)

        # 6) second conv FFN
        y = MlpDWBN(self.dim, self.ffn_hidden_ratio * self.dim, norm="layer",
                    dropout=self.dropout, fused_ln=self.fused_conv_ffn,
                    fused_dw=self.fused_dw,
                    dtype=self.dtype, name="spatial_ffn2")(
            ln("norm6")(tgt), deterministic=deterministic, train=train)
        return tgt + dp(y, deterministic=deterministic)


class TSLMA(nn.Module):
    """Temporal-spatial local multi-head attention: enc-dec attention over
    (T x win^2) token sequences per window column
    (reference: VidHRFormer_modules.py:219-284)."""

    dim: int
    num_heads: int
    window: int = 4
    dropout: float = 0.0
    fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, memory, query, pos3d, *, deterministic: bool = True):
        n, t1 = memory.shape[0], memory.shape[1]
        t2, h, w = query.shape[1], query.shape[2], query.shape[3]
        c = self.dim
        win2 = self.window * self.window
        mem_w = temporal_window_partition(memory, self.window)  # (B', T1*w2, C)
        qry_w = temporal_window_partition(query, self.window)   # (B', T2*w2, C)
        # pos3d: (T1+T2, win, win, C); keys take [0:T1], queries [T1:T1+T2]
        pos = pos3d.reshape(t1 + t2, win2, c)
        pos_k = pos[:t1].reshape(1, t1 * win2, c).astype(mem_w.dtype)
        pos_q = pos[t1:t1 + t2].reshape(1, t2 * win2, c).astype(qry_w.dtype)
        out = MultiHeadAttention(self.dim, self.num_heads, self.dropout,
                                 fused=self.fused, dtype=self.dtype,
                                 name="attn")(
            qry_w + pos_q, mem_w + pos_k, mem_w, deterministic=deterministic)
        return temporal_window_reverse(out, self.window, t2, (h, w))


class _ScanEncoderBlock(nn.Module):
    """EncoderBlock wrapped to the (carry, *broadcast) -> (carry, None)
    shape nn.scan expects. Used by scan_layers=True stacks."""

    dim: int
    num_heads: int
    window: int
    dropout: float
    drop_path: float
    attn_dropout: Optional[float]
    ffn_hidden_ratio: int
    dim_feedforward: int
    far: bool
    rpe: bool
    fused_attention: bool
    remat: bool
    fused_full: bool = False
    fused_full_blocks: tuple = (32, 16)
    fused_full_temporal: bool = False
    fused_residual: bool = False
    fused_ffn: bool = False
    fused_dw: bool = False
    fused_conv_ffn: bool = False
    sequence_parallel: bool = False
    conv_ffn_norm: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos2d, pos_t, train, deterministic):
        cls = (nn.remat(EncoderBlock, static_argnums=(4, 5))
               if self.remat else EncoderBlock)
        y = cls(self.dim, self.num_heads, self.window, self.dropout,
                self.drop_path, self.attn_dropout, self.ffn_hidden_ratio,
                self.dim_feedforward, far=self.far, rpe=self.rpe,
                fused_attention=self.fused_attention,
                fused_full=self.fused_full,
                fused_full_blocks=self.fused_full_blocks,
                fused_full_temporal=self.fused_full_temporal,
                fused_residual=self.fused_residual,
                fused_ffn=self.fused_ffn,
                fused_dw=self.fused_dw,
                fused_conv_ffn=self.fused_conv_ffn,
                sequence_parallel=self.sequence_parallel,
                conv_ffn_norm=self.conv_ffn_norm, dtype=self.dtype,
                name="block")(x, pos2d, pos_t, train, deterministic)
        return y, None


class _ScanDecoderBlockNAR(nn.Module):
    """DecoderBlockNAR wrapped to the (carry, *broadcast) -> (carry, None)
    shape nn.scan expects. Used by scan_layers=True NAR stacks."""

    dim: int
    num_heads: int
    window: int
    dropout: float
    drop_path: float
    attn_dropout: Optional[float]
    ffn_hidden_ratio: int
    dim_feedforward: int
    tslma: bool
    rpe: bool
    fused_attention: bool
    remat: bool
    fused_full: bool = False
    fused_full_blocks: tuple = (32, 16)
    fused_full_temporal: bool = False
    fused_residual: bool = False
    fused_ffn: bool = False
    fused_dw: bool = False
    fused_conv_ffn: bool = False
    sequence_parallel: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos, memory, pos2d, pos_t_future,
                 pos_t_past, pos3d, train, deterministic):
        cls = (nn.remat(DecoderBlockNAR, static_argnums=(8, 9))
               if self.remat else DecoderBlockNAR)
        y = cls(self.dim, self.num_heads, self.window, self.dropout,
                self.drop_path, self.attn_dropout, self.ffn_hidden_ratio,
                self.dim_feedforward, tslma=self.tslma, rpe=self.rpe,
                fused_attention=self.fused_attention,
                fused_full=self.fused_full,
                fused_full_blocks=self.fused_full_blocks,
                fused_full_temporal=self.fused_full_temporal,
                fused_residual=self.fused_residual,
                fused_ffn=self.fused_ffn,
                fused_dw=self.fused_dw,
                fused_conv_ffn=self.fused_conv_ffn,
                sequence_parallel=self.sequence_parallel, dtype=self.dtype,
                name="block")(tgt, query_pos, memory, pos2d, pos_t_future,
                              pos_t_past, pos3d, train, deterministic)
        return y, None


class VPTRFormerFAR(nn.Module):
    """Fully-autoregressive latent transformer: encoder-only, causal in time
    (reference: model/VPTR_modules.py:154-197).

    Input/output: (N, T, h, w, d_model) latent feature maps, T <= Tp+Tf.
    Output frame t predicts input frame t+1 (teacher forcing shift).
    """

    num_past_frames: int = 10
    num_future_frames: int = 10
    enc_h: int = 8
    enc_w: int = 8
    d_model: int = 528
    num_heads: int = 8
    num_encoder_layers: int = 12
    window: int = 4
    dropout: float = 0.1
    drop_path: float = 0.1
    attn_dropout: Optional[float] = None
    ffn_hidden_ratio: int = 4
    rpe: bool = False
    fused_attention: bool = False
    fused_full: bool = False
    fused_full_blocks: tuple = (32, 16)
    fused_full_temporal: bool = False
    fused_residual: bool = False
    fused_ffn: bool = False
    fused_dw: bool = False
    fused_conv_ffn: bool = False
    sequence_parallel: bool = False
    remat: bool = False                 # rematerialize blocks in backward
    scan_layers: bool = False           # nn.scan the block stack: ~L-times
                                        # smaller HLO / faster compiles;
                                        # params stack to (L, ...) leaves
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, *, train: bool = False,
                 deterministic: Optional[bool] = None):
        if deterministic is None:
            deterministic = not train
        t = feats.shape[1]
        t_max = self.num_past_frames + self.num_future_frames
        assert t <= t_max, f"sequence length {t} exceeds {t_max}"
        pos2d = position_embedding_2d(self.window, self.window, self.d_model)
        pos_t = position_embedding_1d(t_max, self.d_model)[:t]

        block_args = dict(dim=self.d_model, num_heads=self.num_heads,
                          window=self.window, dropout=self.dropout,
                          drop_path=self.drop_path,
                          attn_dropout=self.attn_dropout,
                          ffn_hidden_ratio=self.ffn_hidden_ratio,
                          dim_feedforward=self.ffn_hidden_ratio * self.d_model,
                          far=True, rpe=self.rpe,
                          fused_attention=self.fused_attention,
                          fused_full=self.fused_full,
                          fused_full_blocks=self.fused_full_blocks,
                          fused_full_temporal=self.fused_full_temporal,
                fused_residual=self.fused_residual,
                          fused_ffn=self.fused_ffn,
                          fused_dw=self.fused_dw,
                fused_conv_ffn=self.fused_conv_ffn,
                          sequence_parallel=self.sequence_parallel,
                          dtype=self.dtype)
        x = feats
        if self.scan_layers:
            stack = nn.scan(
                _ScanEncoderBlock,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast,) * 4,
                length=self.num_encoder_layers)(
                remat=self.remat, name="blocks", **block_args)
            x, _ = stack(x, pos2d, pos_t, train, deterministic)
        else:
            block_cls = (nn.remat(EncoderBlock, static_argnums=(4, 5))
                         if self.remat else EncoderBlock)
            for i in range(self.num_encoder_layers):
                x = block_cls(name=f"block{i}", **block_args)(
                    x, pos2d, pos_t, train, deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_norm")(x)
        return nn.relu(x)


class VPTRFormerNAR(nn.Module):
    """Non-autoregressive latent transformer: encoder over past features +
    decoder over learned frame queries (reference: model/VPTR_modules.py:98-152).

    Input (N, Tp, h, w, d_model) -> output (N, Tf, h, w, d_model).
    """

    num_past_frames: int = 10
    num_future_frames: int = 10
    enc_h: int = 8
    enc_w: int = 8
    d_model: int = 528
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    window: int = 4
    dropout: float = 0.1
    drop_path: float = 0.1
    attn_dropout: Optional[float] = None
    ffn_hidden_ratio: int = 4
    tslma: bool = False
    rpe: bool = True
    fused_attention: bool = False
    fused_full: bool = False
    fused_full_blocks: tuple = (32, 16)
    fused_full_temporal: bool = False
    fused_residual: bool = False
    fused_ffn: bool = False
    fused_dw: bool = False
    fused_conv_ffn: bool = False
    sequence_parallel: bool = False
    remat: bool = False                 # rematerialize blocks in backward
    scan_layers: bool = False           # nn.scan both stacks: ~L-times
                                        # smaller HLO / faster compiles;
                                        # params stack to (L, ...) leaves
    conv_ffn_norm_enc: Optional[str] = None   # None -> batch (reference parity)
    dtype: Dtype = jnp.float32

    def setup(self):
        block_args = dict(dim=self.d_model, num_heads=self.num_heads,
                          window=self.window, dropout=self.dropout,
                          drop_path=self.drop_path,
                          attn_dropout=self.attn_dropout,
                          ffn_hidden_ratio=self.ffn_hidden_ratio,
                          dim_feedforward=self.ffn_hidden_ratio * self.d_model,
                          rpe=self.rpe,
                          fused_attention=self.fused_attention,
                          fused_full=self.fused_full,
                          fused_full_blocks=self.fused_full_blocks,
                          fused_full_temporal=self.fused_full_temporal,
                fused_residual=self.fused_residual,
                          fused_ffn=self.fused_ffn,
                          fused_dw=self.fused_dw,
                fused_conv_ffn=self.fused_conv_ffn,
                          sequence_parallel=self.sequence_parallel,
                          dtype=self.dtype)
        if self.scan_layers:
            # nn.scan over both stacks: one traced block per stack ->
            # ~L-times smaller HLO / faster compiles; params stack to
            # (L, ...) leaves (same trade as the FAR variant)
            self.enc_stack = nn.scan(
                _ScanEncoderBlock,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast,) * 4,
                length=self.num_encoder_layers)(
                remat=self.remat, far=False,
                conv_ffn_norm=self.conv_ffn_norm_enc,
                name="enc_blocks", **block_args)
            self.dec_stack = nn.scan(
                _ScanDecoderBlockNAR,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast,) * 8,
                length=self.num_decoder_layers)(
                remat=self.remat, tslma=self.tslma,
                name="dec_blocks", **block_args)
        else:
            enc_cls = (nn.remat(EncoderBlock, static_argnums=(4, 5))
                       if self.remat else EncoderBlock)
            dec_cls = (nn.remat(DecoderBlockNAR, static_argnums=(8, 9))
                       if self.remat else DecoderBlockNAR)
            self.enc_blocks = [
                enc_cls(far=False, conv_ffn_norm=self.conv_ffn_norm_enc,
                        name=f"enc_block{i}", **block_args)
                for i in range(self.num_encoder_layers)]
            self.dec_blocks = [
                dec_cls(tslma=self.tslma, name=f"dec_block{i}", **block_args)
                for i in range(self.num_decoder_layers)]
        self.enc_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.dec_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        # learned frame queries (reference: VPTR_modules.py:132)
        self.frame_queries = self.param(
            "frame_queries", xavier_uniform,
            (self.num_future_frames, self.enc_h, self.enc_w, self.d_model),
            jnp.float32)
        # NCE projector (reference: VPTR_modules.py:135-137)
        self.nce_fc1 = nn.Dense(self.d_model, dtype=self.dtype,
                                kernel_init=xavier_uniform)
        self.nce_fc2 = nn.Dense(self.d_model, dtype=self.dtype,
                                kernel_init=xavier_uniform)

    def __call__(self, past_feats, *, train: bool = False,
                 deterministic: Optional[bool] = None):
        if deterministic is None:
            deterministic = not train
        assert past_feats.shape[2:4] == (self.enc_h, self.enc_w), (
            f"latent spatial {past_feats.shape[2:4]} != configured "
            f"(enc_h, enc_w)=({self.enc_h}, {self.enc_w}) — the frame "
            "queries are shape-bound to the latent geometry")
        n, tp = past_feats.shape[0], past_feats.shape[1]
        tf_ = self.num_future_frames
        t_max = self.num_past_frames + tf_
        pos2d = position_embedding_2d(self.window, self.window, self.d_model)
        pos_t = position_embedding_1d(t_max, self.d_model)
        pos3d = position_embedding_3d(t_max, self.window, self.window,
                                      self.d_model) if self.tslma else None

        x = past_feats
        if self.scan_layers:
            x, _ = self.enc_stack(x, pos2d, pos_t[:tp], train, deterministic)
        else:
            for block in self.enc_blocks:
                x = block(x, pos2d, pos_t[:tp], train, deterministic)
        memory = self.enc_norm(x)

        # queries broadcast over batch; target starts at zero
        # (reference: VidHRFormer.py:46-48)
        query_pos = jnp.broadcast_to(
            self.frame_queries.astype(self.dtype)[None],
            (n, tf_, self.enc_h, self.enc_w, self.d_model))
        tgt = jnp.zeros_like(query_pos)

        if self.scan_layers:
            tgt, _ = self.dec_stack(tgt, query_pos, memory, pos2d,
                                    pos_t[tp:tp + tf_], pos_t[:tp], pos3d,
                                    train, deterministic)
        else:
            for block in self.dec_blocks:
                tgt = block(tgt, query_pos, memory, pos2d,
                            pos_t[tp:tp + tf_], pos_t[:tp], pos3d, train,
                            deterministic)
        tgt = self.dec_norm(tgt)
        return nn.relu(tgt)

    def nce_project(self, feats):
        """MLP projector for the BiPatchNCE loss
        (reference: VPTR_modules.py:135-137). feats: (..., d_model)."""
        return self.nce_fc2(nn.relu(self.nce_fc1(feats)))

    def init_all(self, past_feats, *, train: bool = False,
                 deterministic: Optional[bool] = None):
        """Init entry point that touches every submodule (setup-style modules
        only create params for traced paths, so plain init would miss the NCE
        projector)."""
        pred = self.__call__(past_feats, train=train,
                             deterministic=deterministic)
        self.nce_project(pred)
        return pred


def build_transformer(cfg, dtype=jnp.float32):
    """Construct the FAR or NAR transformer from a TransformerConfig."""
    if cfg.fused_conv_ffn and jax.default_backend() == "tpu":
        # Both conv-FFN kernel shapes compile and run standalone on TPU, but
        # composing them inside the full jitted train step crashes the remote
        # Mosaic toolchain — and the kernel measures SLOWER than XLA's own
        # fusion anyway (BENCH_NOTES.md "Fused conv-FFN"). Refuse early with
        # a pointer instead of letting the jit die mid-compile.
        raise ValueError(
            "transformer.fused_conv_ffn is a measured-slower ablation whose "
            "full-model composition crashes the TPU Mosaic toolchain; run it "
            "on CPU (interpret mode) or standalone via "
            "vptr_tpu.ops.fused_conv_ln. See BENCH_NOTES.md 'Fused conv-FFN'.")
    common = dict(num_past_frames=cfg.num_past_frames,
                  num_future_frames=cfg.num_future_frames,
                  enc_h=cfg.enc_h, enc_w=cfg.enc_w, d_model=cfg.d_model,
                  num_heads=cfg.n_heads, window=cfg.window_size,
                  dropout=cfg.dropout, drop_path=cfg.drop_path,
                  attn_dropout=cfg.attention_dropout,
                  ffn_hidden_ratio=cfg.spatial_ffn_hidden_ratio,
                  rpe=cfg.rpe, fused_attention=cfg.fused_attention,
                  fused_full=cfg.fused_full,
                  fused_full_blocks=tuple(cfg.fused_full_blocks),
                  fused_full_temporal=cfg.fused_full_temporal,
                  fused_residual=cfg.fused_residual,
                  fused_ffn=cfg.fused_ffn,
                  fused_dw=cfg.fused_dw,
                  fused_conv_ffn=cfg.fused_conv_ffn,
                  sequence_parallel=cfg.sequence_parallel,
                  remat=cfg.remat, dtype=dtype)
    if cfg.variant == "far":
        return VPTRFormerFAR(num_encoder_layers=cfg.num_encoder_layers,
                             scan_layers=cfg.scan_layers, **common)
    if cfg.variant == "nar":
        enc_norm = None if cfg.conv_ffn_norm == "auto" else cfg.conv_ffn_norm
        return VPTRFormerNAR(num_encoder_layers=cfg.num_encoder_layers,
                             num_decoder_layers=cfg.num_decoder_layers,
                             tslma=cfg.tslma, conv_ffn_norm_enc=enc_norm,
                             scan_layers=cfg.scan_layers, **common)
    raise ValueError(f"unknown variant {cfg.variant!r}")
