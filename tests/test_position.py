"""Position embeddings vs the reference formulas, computed independently here
with numpy (reference: utils/position_encoding.py:13-160)."""

import numpy as np

from vptr_tpu.models.position import (
    position_embedding_1d,
    position_embedding_2d,
    position_embedding_3d,
)


def _ref_sine(pos, dim, temperature=10000.0):
    """Independent re-derivation of the DETR interleave: for position p,
    channel 2i = sin(p / T^(2i/dim)), channel 2i+1 = cos(p / T^(2i/dim))."""
    out = np.zeros(pos.shape + (dim,))
    for i in range(dim):
        freq = temperature ** (2 * (i // 2) / dim)
        val = pos / freq
        out[..., i] = np.sin(val) if i % 2 == 0 else np.cos(val)
    return out


def test_1d_values():
    got = np.asarray(position_embedding_1d(7, 10))
    want = _ref_sine(np.arange(1, 8, dtype=np.float64), 10)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_2d_layout():
    """First dim/2 channels = y embedding, second half = x embedding
    (reference: utils/position_encoding.py:87-91)."""
    got = np.asarray(position_embedding_2d(4, 5, 8))
    ey = _ref_sine(np.arange(1, 5, dtype=np.float64), 4)
    ex = _ref_sine(np.arange(1, 6, dtype=np.float64), 4)
    for yy in range(4):
        for xx in range(5):
            np.testing.assert_allclose(got[yy, xx, :4], ey[yy], atol=1e-6)
            np.testing.assert_allclose(got[yy, xx, 4:], ex[xx], atol=1e-6)


def test_3d_layout():
    got = np.asarray(position_embedding_3d(3, 2, 2, 9))
    et = _ref_sine(np.arange(1, 4, dtype=np.float64), 3)
    np.testing.assert_allclose(got[:, 0, 0, :3], et, atol=1e-6)
    assert got.shape == (3, 2, 2, 9)
