"""Native data-path kernels (skipped when no C++ toolchain is present)."""

import numpy as np
import pytest

from vptr_tpu.data.datasets import SyntheticMovingMNIST
from vptr_tpu.data.loader import ClipLoader
from vptr_tpu.data.native import (
    native_available,
    normalize_f32,
    normalize_u8,
    render_clips,
)
from vptr_tpu.data.transforms import ClipTransform

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native library unavailable")


def test_render_clips_deterministic_and_bounded():
    ds = SyntheticMovingMNIST(num_clips=4, num_past=2, num_future=2, size=32)
    idx = np.arange(4)
    a = render_clips(ds.glyphs, 7, idx, 4, 32, 1)
    b = render_clips(ds.glyphs, 7, idx, 4, 32, 1)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (4, 4, 32, 32, 1)
    assert a.min() >= 0.0 and a.max() <= 1.0
    assert a.max() > 0.3                       # glyphs rendered
    c = render_clips(ds.glyphs, 8, idx, 4, 32, 1)
    assert np.abs(a - c).max() > 0.1           # seed changes content


def test_normalize_kernels_match_numpy():
    rng = np.random.default_rng(0)
    u8 = (rng.random((2, 3, 16, 16, 3)) * 255).astype(np.uint8)
    mean, std = (0.6, 0.5, 0.4), (2.0, 2.1, 1.9)
    got = normalize_u8(u8, mean, std)
    ref = (u8.astype(np.float32) / 255 - np.asarray(mean, np.float32)) / \
        np.asarray(std, np.float32)
    np.testing.assert_allclose(got, ref, atol=1e-6)

    f32 = rng.random((2, 3, 16, 16, 1)).astype(np.float32)
    got2 = normalize_f32(f32, (0.5,), (2.0,))
    np.testing.assert_allclose(got2, (f32 - 0.5) / 2.0, atol=1e-7)


def test_loader_uses_native_batch_path():
    tf = ClipTransform(mean=(0.1,), std=(1.5,), flips=False)
    ds = SyntheticMovingMNIST(num_clips=8, num_past=2, num_future=2,
                              size=32, transform=tf)
    loader = ClipLoader(ds, batch_size=4, shuffle=False, prefetch=0)
    past, future = next(iter(loader))
    assert past.shape == (4, 2, 32, 32, 1)
    # normalization was applied
    assert past.min() < 0.0
    # deterministic across epochs without flips
    past2, _ = next(iter(loader))
    np.testing.assert_array_equal(past, past2)


def test_render_clips_dynamic_mode():
    ds = SyntheticMovingMNIST(num_clips=4, num_past=5, num_future=5, size=64)
    idx = np.arange(4)
    a = render_clips(ds.glyphs, 3, idx, 10, 64, 1, 3, "dynamic", 0.03)
    b = render_clips(ds.glyphs, 3, idx, 10, 64, 1, 3, "dynamic", 0.03)
    np.testing.assert_array_equal(a, b)          # deterministic
    assert a.shape == (4, 10, 64, 64, 1)
    assert a.min() >= 0.0 and a.max() <= 1.0
    lin = render_clips(ds.glyphs, 3, idx, 10, 64, 1, 3, "linear", 0.0)
    assert np.abs(a - lin).max() > 0.1           # different dynamics
    # noise touches background pixels
    clean = render_clips(ds.glyphs, 3, idx, 10, 64, 1, 3, "dynamic", 0.0)
    assert (a > 0).mean() > 0.3 and (clean > 0).mean() < 0.3


def test_render_clips_linear_noise_and_digit_cap():
    """The noise knob composes with linear motion too, and the native
    dynamic renderer refuses (-> Python fallback) beyond its kMaxD=8
    per-digit state capacity instead of silently clamping."""
    ds = SyntheticMovingMNIST(num_clips=4, num_past=5, num_future=5, size=64)
    idx = np.arange(4)
    noisy = render_clips(ds.glyphs, 3, idx, 10, 64, 1, 3, "linear", 0.03)
    clean = render_clips(ds.glyphs, 3, idx, 10, 64, 1, 3, "linear", 0.0)
    np.testing.assert_array_equal(
        noisy, render_clips(ds.glyphs, 3, idx, 10, 64, 1, 3, "linear", 0.03))
    assert noisy.min() >= 0.0 and noisy.max() <= 1.0
    assert (noisy > 0).mean() > 0.3 and (clean > 0).mean() < 0.3
    assert render_clips(ds.glyphs, 3, idx, 10, 64, 1, 9, "dynamic", 0.0) is None
    assert render_clips(ds.glyphs, 3, idx, 10, 64, 1, 9, "linear", 0.0) is not None
