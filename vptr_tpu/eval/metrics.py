"""Image quality metrics in JAX: PSNR / MSE / SSIM (+ per-timestep curves).

Behavior parity with the reference metrics (reference: utils/metrics.py):
PSNR = mean over batch of -10*log10(per-image MSE + 1e-8); SSIM uses an
11x11 sigma-1.5 Gaussian window with same-padding depthwise convolution.
Channels-last (N, H, W, C).
"""

from __future__ import annotations

from functools import partial
from math import exp

import jax
import jax.numpy as jnp
import numpy as np


def psnr(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Batch-average PSNR (reference: utils/metrics.py:12-28)."""
    x = x.astype(jnp.float32) / data_range
    y = y.astype(jnp.float32) / data_range
    mse = jnp.mean(jnp.square(x - y), axis=(1, 2, 3))
    return jnp.mean(-10.0 * jnp.log10(mse + 1e-8))


def mse_score(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Batch-average per-image summed squared error
    (reference: utils/metrics.py:30-40)."""
    se = jnp.sum(jnp.square(x.astype(jnp.float32) - y.astype(jnp.float32)),
                 axis=(1, 2, 3))
    return jnp.mean(se)


def _gaussian_window(size: int, sigma: float) -> np.ndarray:
    g = np.array([exp(-(i - size // 2) ** 2 / (2.0 * sigma ** 2))
                  for i in range(size)])
    g = g / g.sum()
    return np.outer(g, g)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5, size_average: bool = True) -> jnp.ndarray:
    """Structural similarity (reference: utils/metrics.py:43-106).

    Depthwise same-padded Gaussian filtering; C1=0.01^2, C2=0.03^2.
    """
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    c = img1.shape[-1]
    w2d = _gaussian_window(window_size, sigma)
    kernel = jnp.asarray(np.tile(w2d[:, :, None, None], (1, 1, 1, c)),
                         jnp.float32)  # (k, k, 1, C) depthwise HWIO

    conv = partial(jax.lax.conv_general_dilated,
                   window_strides=(1, 1),
                   padding=[(window_size // 2,) * 2] * 2,
                   dimension_numbers=("NHWC", "HWIO", "NHWC"),
                   feature_group_count=c)
    mu1 = conv(img1, kernel)
    mu2 = conv(img2, kernel)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = conv(img1 * img1, kernel) - mu1_sq
    sigma2_sq = conv(img2 * img2, kernel) - mu2_sq
    sigma12 = conv(img1 * img2, kernel) - mu1_mu2

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))


METRIC_FNS = {"psnr": psnr, "ssim": ssim, "mse": mse_score}


def per_timestep_metrics(pred: jnp.ndarray, target: jnp.ndarray,
                         metric: str = "psnr",
                         renorm=None) -> jnp.ndarray:
    """Per-future-timestep metric curve over (N, T, H, W, C) clips —
    the reference's ``pred_ave_metrics`` inner loop
    (reference: utils/metrics.py:108-137). Returns shape (T,)."""
    fn = METRIC_FNS[metric]
    if renorm is not None:
        pred = renorm(pred)
        target = renorm(target)
    return jax.vmap(lambda p, t: fn(p, t), in_axes=(1, 1))(pred, target)
