"""PatchGAN discriminator (pix2pix lineage).

Behavior parity with the reference (reference: model/VPTR_modules.py:49-95):
4x4 stride-2 conv stack with LeakyReLU(0.2), channel growth capped at 8x,
final stride-1 convs down to a 1-channel patch logit map. Channels-last.
"""

from __future__ import annotations

from typing import Any

from flax import linen as nn

from vptr_tpu.models.autoencoder import make_conv_init

Dtype = Any


class PatchDiscriminator(nn.Module):
    """Input (N, H, W, C_img) -> patch logits (N, h', w', 1)."""

    ndf: int = 64
    n_layers: int = 3
    norm: str = "batch"
    init_type: str = "normal"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        use_bias = self.norm == "instance"
        normal_002 = make_conv_init(self.init_type)
        lrelu = lambda z: nn.leaky_relu(z, negative_slope=0.2)

        def norm_layer(z, name):
            if self.norm == "batch":
                return nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype, name=name)(z)
            if self.norm == "group":
                return nn.GroupNorm(num_groups=None,
                                    group_size=max(1, z.shape[-1] // 32),
                                    epsilon=1e-5, dtype=self.dtype, name=name)(z)
            if self.norm == "instance":
                return nn.GroupNorm(num_groups=z.shape[-1], epsilon=1e-5,
                                    dtype=self.dtype, name=name)(z)
            raise ValueError(f"unknown norm {self.norm!r}")

        y = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=1,
                    kernel_init=normal_002, dtype=self.dtype, name="conv0")(x)
        y = lrelu(y)
        mult = 1
        for n in range(1, self.n_layers):
            mult = min(2 ** n, 8)
            y = nn.Conv(self.ndf * mult, (4, 4), strides=(2, 2), padding=1,
                        use_bias=use_bias, kernel_init=normal_002,
                        dtype=self.dtype, name=f"conv{n}")(y)
            y = lrelu(norm_layer(y, f"norm{n}"))
        mult = min(2 ** self.n_layers, 8)
        y = nn.Conv(self.ndf * mult, (4, 4), strides=(1, 1), padding=1,
                    use_bias=use_bias, kernel_init=normal_002,
                    dtype=self.dtype, name=f"conv{self.n_layers}")(y)
        y = lrelu(norm_layer(y, f"norm{self.n_layers}"))
        return nn.Conv(1, (4, 4), strides=(1, 1), padding=1,
                       kernel_init=normal_002, dtype=self.dtype,
                       name="head")(y)


def build_discriminator(cfg, dtype=None):
    return PatchDiscriminator(ndf=cfg.ndf, n_layers=cfg.n_layers,
                              norm=cfg.norm, init_type=cfg.init_type,
                              dtype=dtype)
