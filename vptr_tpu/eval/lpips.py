"""LPIPS perceptual metric (AlexNet backbone) in flax.

The reference computes LPIPS only in its eval notebook via the pip ``lpips``
package (reference: Test_VPTR.ipynb cell 9, gray->3-channel repeat). This
is a from-scratch flax implementation of the same metric:

* AlexNet conv trunk (5 feature taps), inputs scaled to [-1, 1] then
  channel-normalized with the ImageNet shift/scale the metric defines;
* unit-normalize each tap over channels, squared difference;
* 1x1 linear head per tap, spatial mean, sum over taps.

Pretrained weights cannot be downloaded in this environment (zero egress),
so weights load from a local ``.npz`` (see ``load_weights``) exported from
the reference ``lpips`` package with ``scripts/export_lpips.py``. Without a
weights file the module still runs (random init) — fine for smoke tests,
meaningless as a metric — and ``lpips_available()`` reports the difference.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# channel normalization from the LPIPS definition
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_ALEX_CFG = (
    # (features, kernel, stride, padding)
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
_MAXPOOL_AFTER = {0, 1}   # pool after taps 0 and 1 (AlexNet features layout)


class AlexNetFeatures(nn.Module):
    """AlexNet conv trunk returning the 5 LPIPS feature taps. NHWC."""

    @nn.compact
    def __call__(self, x):
        taps = []
        for i, (feat, k, s, p) in enumerate(_ALEX_CFG):
            x = nn.Conv(feat, (k, k), strides=(s, s), padding=p,
                        name=f"conv{i}")(x)
            x = nn.relu(x)
            taps.append(x)
            if i in _MAXPOOL_AFTER:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """Full LPIPS head. Input frames in [0, 1], NHWC, 1 or 3 channels."""

    @nn.compact
    def __call__(self, img1, img2):
        def prep(img):
            if img.shape[-1] == 1:      # gray -> RGB repeat (notebook parity)
                img = jnp.repeat(img, 3, axis=-1)
            img = img * 2.0 - 1.0        # [0,1] -> [-1,1]
            return (img - _SHIFT) / _SCALE

        trunk = AlexNetFeatures(name="alex")
        taps1 = trunk(prep(img1))
        taps2 = trunk(prep(img2))

        def unit_norm(f):
            return f * jax.lax.rsqrt(
                jnp.sum(jnp.square(f), axis=-1, keepdims=True) + 1e-10)

        total = 0.0
        for i, (f1, f2) in enumerate(zip(taps1, taps2)):
            diff = jnp.square(unit_norm(f1) - unit_norm(f2))
            w = self.param(f"lin{i}", nn.initializers.ones,
                           (diff.shape[-1],), jnp.float32)
            # non-negative 1x1 conv head, as in the reference metric
            score = jnp.sum(diff * jnp.abs(w), axis=-1)   # (N, h, w)
            total = total + jnp.mean(score, axis=(1, 2))  # spatial mean
        return total                                      # (N,)


DEFAULT_WEIGHTS = os.environ.get(
    "VPTR_LPIPS_WEIGHTS", str(Path(__file__).parent / "lpips_alex.npz"))


def load_weights(path: Optional[str] = None):
    """Load LPIPS params from an .npz of flat names:
    ``alex/conv{i}/kernel`` (HWIO), ``alex/conv{i}/bias``, ``lin{i}``.
    Returns a params pytree or None when the file is absent."""
    path = path or DEFAULT_WEIGHTS
    if not Path(path).exists():
        return None
    flat = np.load(path)
    params = {"alex": {}}
    for i in range(len(_ALEX_CFG)):
        params["alex"][f"conv{i}"] = {
            "kernel": jnp.asarray(flat[f"alex/conv{i}/kernel"]),
            "bias": jnp.asarray(flat[f"alex/conv{i}/bias"]),
        }
    for i in range(5):
        params[f"lin{i}"] = jnp.asarray(flat[f"lin{i}"])
    return params


def lpips_available(path: Optional[str] = None) -> bool:
    return Path(path or DEFAULT_WEIGHTS).exists()


def make_lpips_fn(weights_path: Optional[str] = None, image_size: int = 64):
    """Returns a jitted (img1, img2) -> (N,) LPIPS function, or None when no
    pretrained weights exist."""
    params = load_weights(weights_path)
    if params is None:
        return None
    model = LPIPS()

    @jax.jit
    def fn(img1, img2):
        return model.apply({"params": params}, img1, img2)

    return fn
