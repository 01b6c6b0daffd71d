"""Stage-1 ResNet conv autoencoder, channels-last, jit-first.

Capability parity with the reference encoder/decoder
(reference: model/ResNetAutoEncoder.py:8-158, model/VPTR_modules.py:10-47):

* Encoder: reflect-pad 7x7 conv -> (n_downsampling) stride-2 3x3 convs
  (last one widens to ``feat_dim``) -> 9 residual blocks -> ReLU.
  64x64 -> 8x8 with n_downsampling=3.
* Decoder: mirror ConvTranspose (exact torch k3/s2/p1/op1 geometry) ->
  reflect-pad 7x7 conv -> tanh | sigmoid.
* Both operate on (N, T, H, W, C) by folding time into batch — a single
  big MXU-friendly conv batch, as the reference folds (N,T)->(N*T)
  (VPTR_modules.py:23-28).

Norms are configurable: ``batch`` is the reference default (BatchNorm2d);
``group`` is the recommended TPU-native swap (no cross-step running stats,
no host sync, identical quality in our ablations — see tests).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

normal_002 = nn.initializers.normal(stddev=0.02)


def make_conv_init(init_type: str = "normal", gain: float = 0.02):
    """Conv/linear weight init selector — parity with the reference's
    ``init_weights`` (reference: ResNetAutoEncoder.py:160-189):
    normal | xavier | kaiming | orthogonal."""
    if init_type == "normal":
        return nn.initializers.normal(stddev=gain)
    if init_type == "xavier":
        # torch xavier_normal_(gain=g): std = g * sqrt(2/(fan_in+fan_out))
        return nn.initializers.variance_scaling(
            gain * gain * 2.0, "fan_avg", "normal")
    if init_type == "kaiming":
        # torch kaiming_normal_(a=0, fan_in): std = sqrt(2/fan_in)
        return nn.initializers.variance_scaling(2.0, "fan_in", "normal")
    if init_type == "orthogonal":
        return nn.initializers.orthogonal(scale=gain)
    raise ValueError(f"unknown init type {init_type!r}")


def _pad2d(x: jnp.ndarray, pad: int, mode: str) -> jnp.ndarray:
    """Spatial padding on (N, H, W, C). mode: reflect | replicate | zero."""
    if pad == 0:
        return x
    cfg = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    if mode == "reflect":
        return jnp.pad(x, cfg, mode="reflect")
    if mode == "replicate":
        return jnp.pad(x, cfg, mode="edge")
    if mode == "zero":
        return jnp.pad(x, cfg)
    raise ValueError(f"unknown padding mode {mode!r}")


class TorchConvTranspose(nn.Module):
    """ConvTranspose with exact torch ``ConvTranspose2d(k,s,p,output_padding)``
    geometry: correlate the stride-dilated, (k-1-p, k-1-p+op)-padded input with
    the spatially flipped kernel. Kernel is stored HWIO. Verified numerically
    against torch in tests/test_autoencoder.py."""

    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32
    kernel_init: Any = normal_002

    @nn.compact
    def __call__(self, x):
        k, s, p, op = (self.kernel_size, self.stride, self.padding,
                       self.output_padding)
        in_ch = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (k, k, in_ch, self.features), jnp.float32)
        kernel = jnp.flip(kernel, axis=(0, 1)).astype(self.dtype)
        lo, hi = k - 1 - p, k - 1 - p + op
        # NOTE: no preferred_element_type here — conv_general_dilated's
        # transpose rule would then feed f32 cotangents into a bf16 conv.
        # The TPU MXU accumulates bf16 convs in f32 regardless.
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel, window_strides=(1, 1),
            padding=((lo, hi), (lo, hi)), lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class _NormAct(nn.Module):
    """norm -> ReLU used throughout the conv stacks."""

    norm: str
    dtype: Dtype
    act: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.norm == "batch":
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
        elif self.norm == "group":
            x = nn.GroupNorm(num_groups=None,
                             group_size=max(1, x.shape[-1] // 32),
                             epsilon=1e-5, dtype=self.dtype)(x)
        elif self.norm == "instance":
            x = nn.GroupNorm(num_groups=x.shape[-1], epsilon=1e-5,
                             dtype=self.dtype)(x)
        elif self.norm != "none":
            raise ValueError(f"unknown norm {self.norm!r}")
        if self.act:
            x = nn.relu(x)
        return x


class ResnetBlock(nn.Module):
    """pad -> 3x3 conv -> norm -> ReLU -> pad -> 3x3 conv -> norm, + skip
    (reference: ResNetAutoEncoder.py:104-158)."""

    dim: int
    padding_type: str = "reflect"
    norm: str = "batch"
    use_dropout: bool = False
    init_type: str = "normal"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False, deterministic: bool = True):
        use_bias = self.norm == "instance"
        normal_002 = make_conv_init(self.init_type)
        y = _pad2d(x, 1, self.padding_type)
        y = nn.Conv(self.dim, (3, 3), padding="VALID", use_bias=use_bias,
                    kernel_init=normal_002, dtype=self.dtype, name="conv1")(y)
        y = _NormAct(self.norm, self.dtype, name="na1")(y, train=train)
        if self.use_dropout:
            y = nn.Dropout(0.5, deterministic=deterministic)(y)
        y = _pad2d(y, 1, self.padding_type)
        y = nn.Conv(self.dim, (3, 3), padding="VALID", use_bias=use_bias,
                    kernel_init=normal_002, dtype=self.dtype, name="conv2")(y)
        y = _NormAct(self.norm, self.dtype, act=False, name="na2")(y, train=train)
        return x + y


class ResnetEncoder(nn.Module):
    """Frame encoder on (N, H, W, C_img) -> (N, H/2^d, W/2^d, feat_dim)
    (reference: ResNetAutoEncoder.py:8-51)."""

    ngf: int = 64
    feat_dim: int = 528
    n_downsampling: int = 3
    n_res_blocks: int = 9
    padding_type: str = "reflect"
    norm: str = "batch"
    use_dropout: bool = False
    init_type: str = "normal"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False, deterministic: bool = True):
        use_bias = self.norm == "instance"
        normal_002 = make_conv_init(self.init_type)
        # the stem's reflect pad is UNCONDITIONAL in the reference —
        # padding_type switches only the res blocks
        # (reference: ResNetAutoEncoder.py:26 vs :128-152)
        y = _pad2d(x, 3, "reflect")
        y = nn.Conv(self.ngf, (7, 7), padding="VALID", use_bias=use_bias,
                    kernel_init=normal_002, dtype=self.dtype, name="stem")(y)
        y = _NormAct(self.norm, self.dtype, name="stem_na")(y, train=train)
        for i in range(self.n_downsampling - 1):
            ch = self.ngf * (2 ** (i + 1))
            y = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1,
                        use_bias=use_bias, kernel_init=normal_002,
                        dtype=self.dtype, name=f"down{i}")(y)
            y = _NormAct(self.norm, self.dtype, name=f"down{i}_na")(y, train=train)
        y = nn.Conv(self.feat_dim, (3, 3), strides=(2, 2), padding=1,
                    use_bias=use_bias, kernel_init=normal_002,
                    dtype=self.dtype, name="down_last")(y)
        y = _NormAct(self.norm, self.dtype, name="down_last_na")(y, train=train)
        for i in range(self.n_res_blocks):
            y = ResnetBlock(self.feat_dim, self.padding_type, self.norm,
                            self.use_dropout, self.init_type, self.dtype,
                            name=f"res{i}")(
                y, train=train, deterministic=deterministic)
        return nn.relu(y)


class ResnetDecoder(nn.Module):
    """Latent decoder (N, h, w, feat_dim) -> (N, H, W, C_img)
    (reference: ResNetAutoEncoder.py:53-101)."""

    img_channels: int = 1
    ngf: int = 64
    n_downsampling: int = 3
    padding_type: str = "reflect"
    norm: str = "batch"
    out_layer: str = "tanh"
    init_type: str = "normal"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        use_bias = self.norm == "instance"
        normal_002 = make_conv_init(self.init_type)
        y = x
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            ch = int(self.ngf * mult / 2)
            y = TorchConvTranspose(ch, 3, 2, 1, 1, use_bias=use_bias,
                                   dtype=self.dtype, kernel_init=normal_002,
                                   name=f"up{i}")(y)
            y = _NormAct(self.norm, self.dtype, name=f"up{i}_na")(y, train=train)
        # head reflect pad is unconditional, like the encoder stem
        # (reference: ResNetAutoEncoder.py:89)
        y = _pad2d(y, 3, "reflect")
        y = nn.Conv(self.img_channels, (7, 7), padding="VALID", use_bias=True,
                    kernel_init=normal_002, dtype=self.dtype, name="head")(y)
        if self.out_layer == "tanh":
            return jnp.tanh(y)
        if self.out_layer == "sigmoid":
            return jax.nn.sigmoid(y)
        raise ValueError(f"unsupported out_layer {self.out_layer!r}")


class VPTREnc(nn.Module):
    """Clip encoder: (N, T, H, W, C_img) -> (N, T, h, w, feat_dim), folding
    time into the conv batch (reference: VPTR_modules.py:10-29)."""

    img_channels: int = 1
    feat_dim: int = 528
    ngf: int = 64
    n_downsampling: int = 3
    n_res_blocks: int = 9
    use_dropout: bool = False
    padding_type: str = "reflect"
    norm: str = "batch"
    init_type: str = "normal"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        n, t = x.shape[:2]
        y = x.reshape((n * t,) + x.shape[2:])
        y = ResnetEncoder(ngf=self.ngf, feat_dim=self.feat_dim,
                          n_downsampling=self.n_downsampling,
                          n_res_blocks=self.n_res_blocks,
                          use_dropout=self.use_dropout,
                          padding_type=self.padding_type, norm=self.norm,
                          init_type=self.init_type, dtype=self.dtype,
                          name="encoder")(y, train=train,
                                          deterministic=not train)
        return y.reshape((n, t) + y.shape[1:])


class VPTRDec(nn.Module):
    """Clip decoder: (N, T, h, w, feat_dim) -> (N, T, H, W, C_img)
    (reference: VPTR_modules.py:31-47)."""

    img_channels: int = 1
    ngf: int = 64
    n_downsampling: int = 3
    out_layer: str = "tanh"
    padding_type: str = "reflect"
    norm: str = "batch"
    init_type: str = "normal"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, *, train: bool = False):
        n, t = feat.shape[:2]
        y = feat.reshape((n * t,) + feat.shape[2:])
        y = ResnetDecoder(img_channels=self.img_channels, ngf=self.ngf,
                          n_downsampling=self.n_downsampling,
                          padding_type=self.padding_type, norm=self.norm,
                          out_layer=self.out_layer,
                          init_type=self.init_type, dtype=self.dtype,
                          name="decoder")(y, train=train)
        return y.reshape((n, t) + y.shape[1:])


def build_autoencoder(cfg, dtype=jnp.float32):
    """Construct (VPTREnc, VPTRDec) from an AutoencoderConfig."""
    enc = VPTREnc(img_channels=cfg.img_channels, feat_dim=cfg.feat_dim,
                  ngf=cfg.ngf, n_downsampling=cfg.n_downsampling,
                  n_res_blocks=cfg.n_res_blocks,
                  use_dropout=cfg.use_dropout,
                  padding_type=cfg.padding_type, norm=cfg.norm,
                  init_type=cfg.init_type, dtype=dtype)
    dec = VPTRDec(img_channels=cfg.img_channels, ngf=cfg.ngf,
                  n_downsampling=cfg.n_downsampling,
                  out_layer=cfg.out_layer, padding_type=cfg.padding_type,
                  norm=cfg.norm, init_type=cfg.init_type, dtype=dtype)
    return enc, dec
