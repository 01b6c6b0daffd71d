"""Metric parity: PSNR/SSIM/MSE vs reference semantics (torch oracle +
analytic values; reference: utils/metrics.py)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from vptr_tpu.eval.metrics import mse_score, per_timestep_metrics, psnr, ssim

RNG = np.random.default_rng(3)


def test_psnr_identity_and_value():
    x = RNG.uniform(size=(4, 16, 16, 3)).astype(np.float32)
    # identical images: mse=0 -> -10*log10(1e-8) = 80
    assert abs(float(psnr(jnp.asarray(x), jnp.asarray(x))) - 80.0) < 1e-4
    y = np.clip(x + 0.1, 0, 1).astype(np.float32)
    mse = ((x - y) ** 2).mean(axis=(1, 2, 3))
    want = float(np.mean(-10 * np.log10(mse + 1e-8)))
    got = float(psnr(jnp.asarray(x), jnp.asarray(y)))
    assert abs(got - want) < 1e-4


def test_mse_score():
    x = RNG.normal(size=(2, 4, 4, 1)).astype(np.float32)
    y = RNG.normal(size=(2, 4, 4, 1)).astype(np.float32)
    want = float(np.mean(((x - y) ** 2).sum(axis=(1, 2, 3))))
    assert abs(float(mse_score(jnp.asarray(x), jnp.asarray(y))) - want) < 1e-5


def _torch_ssim(img1, img2):
    """Independent torch implementation of the reference SSIM
    (reference: utils/metrics.py:75-106) as oracle. NCHW input."""
    from math import exp
    window_size, sigma, channel = 11, 1.5, img1.shape[1]
    g = torch.tensor([exp(-(i - 5) ** 2 / (2 * sigma ** 2))
                      for i in range(window_size)])
    g = (g / g.sum()).unsqueeze(1)
    w2 = g.mm(g.t()).unsqueeze(0).unsqueeze(0)
    window = w2.expand(channel, 1, window_size, window_size).contiguous()
    pad = window_size // 2
    mu1 = F.conv2d(img1, window, padding=pad, groups=channel)
    mu2 = F.conv2d(img2, window, padding=pad, groups=channel)
    s1 = F.conv2d(img1 * img1, window, padding=pad, groups=channel) - mu1 ** 2
    s2 = F.conv2d(img2 * img2, window, padding=pad, groups=channel) - mu2 ** 2
    s12 = F.conv2d(img1 * img2, window, padding=pad, groups=channel) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))
    return m.mean().item()


def test_ssim_identity_is_one():
    x = RNG.uniform(size=(2, 32, 32, 1)).astype(np.float32)
    assert abs(float(ssim(jnp.asarray(x), jnp.asarray(x))) - 1.0) < 1e-4


def test_ssim_matches_torch_oracle():
    x = RNG.uniform(size=(2, 24, 24, 3)).astype(np.float32)
    y = RNG.uniform(size=(2, 24, 24, 3)).astype(np.float32)
    ref = _torch_ssim(torch.tensor(x.transpose(0, 3, 1, 2)),
                      torch.tensor(y.transpose(0, 3, 1, 2)))
    got = float(ssim(jnp.asarray(x), jnp.asarray(y)))
    assert abs(got - ref) < 1e-5


def test_per_timestep_metrics_shape():
    pred = jnp.asarray(RNG.uniform(size=(2, 5, 8, 8, 1)).astype(np.float32))
    tgt = jnp.asarray(RNG.uniform(size=(2, 5, 8, 8, 1)).astype(np.float32))
    curve = per_timestep_metrics(pred, tgt, "psnr")
    assert curve.shape == (5,)
    curve2 = per_timestep_metrics(pred, pred, "ssim")
    np.testing.assert_allclose(np.asarray(curve2), 1.0, atol=1e-4)
