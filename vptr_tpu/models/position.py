"""Sinusoidal position embeddings (1D temporal, 2D window, 3D spatio-temporal).

Pure functions of static shapes — computed once at trace time and constant-
folded by XLA. This removes the reference's device pinning bug
(reference: utils/position_encoding.py:56,100 hard-codes cuda:0) and its
nn.Module indirection; the math matches utils/position_encoding.py:13-160.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def _sine_embed(positions: np.ndarray, dim: int, temperature: float) -> np.ndarray:
    """DETR-style interleaved sin/cos embedding of ``positions``.

    positions: float array of any shape S. Returns shape S + (dim,) where
    channel 2i = sin(p / temp^(2i/dim)), channel 2i+1 = cos(p / temp^(2i/dim)).
    Matches the reference's ``stack((sin, cos), -1).flatten`` interleave
    (reference: utils/position_encoding.py:44-45).
    """
    dim_t = np.arange(dim, dtype=np.float64)
    dim_t = temperature ** (2.0 * np.floor(dim_t / 2.0) / dim)
    ang = positions[..., None] / dim_t  # S + (dim,)
    out = np.empty(ang.shape, dtype=np.float64)
    out[..., 0::2] = np.sin(ang[..., 0::2])
    out[..., 1::2] = np.cos(ang[..., 1::2])
    return out


def position_embedding_1d(length: int, dim: int, temperature: float = 10000.0,
                          normalize: bool = False,
                          dtype=jnp.float32) -> jnp.ndarray:
    """1D temporal embedding, shape (length, dim).

    Positions count from 1 (the reference builds them via cumsum of ones,
    utils/position_encoding.py:37).
    """
    pos = np.arange(1, length + 1, dtype=np.float64)
    if normalize:
        pos = pos / (length + 1e-6) * (2 * math.pi)
    return jnp.asarray(_sine_embed(pos, dim, temperature), dtype=dtype)


def position_embedding_2d(height: int, width: int, dim: int,
                          temperature: float = 10000.0, normalize: bool = False,
                          dtype=jnp.float32) -> jnp.ndarray:
    """2D embedding, shape (height, width, dim); first dim//2 channels encode y,
    the rest encode x (reference: utils/position_encoding.py:87-91 concatenates
    (pos_y, pos_x) along the channel dim)."""
    assert dim % 2 == 0, "embedding size must be even"
    y = np.arange(1, height + 1, dtype=np.float64)
    x = np.arange(1, width + 1, dtype=np.float64)
    if normalize:
        y = y / (height + 1e-6) * (2 * math.pi)
        x = x / (width + 1e-6) * (2 * math.pi)
    ey = _sine_embed(y, dim // 2, temperature)           # (H, dim/2)
    ex = _sine_embed(x, dim // 2, temperature)           # (W, dim/2)
    ey = np.broadcast_to(ey[:, None, :], (height, width, dim // 2))
    ex = np.broadcast_to(ex[None, :, :], (height, width, dim // 2))
    return jnp.asarray(np.concatenate([ey, ex], axis=-1), dtype=dtype)


def position_embedding_3d(length: int, height: int, width: int, dim: int,
                          temperature: float = 10000.0, normalize: bool = False,
                          dtype=jnp.float32) -> jnp.ndarray:
    """3D (t, y, x) embedding, shape (length, height, width, dim).

    Channel layout is (t-part, y-part, x-part), each dim//3 wide
    (reference: utils/position_encoding.py:150-158). dim must divide by 3.
    """
    assert dim % 3 == 0, "embedding size must be divisible by 3"
    d3 = dim // 3
    t = np.arange(1, length + 1, dtype=np.float64)
    y = np.arange(1, height + 1, dtype=np.float64)
    x = np.arange(1, width + 1, dtype=np.float64)
    if normalize:
        t = t / (length + 1e-6) * (2 * math.pi)
        y = y / (height + 1e-6) * (2 * math.pi)
        x = x / (width + 1e-6) * (2 * math.pi)
    et = np.broadcast_to(_sine_embed(t, d3, temperature)[:, None, None, :],
                         (length, height, width, d3))
    ey = np.broadcast_to(_sine_embed(y, d3, temperature)[None, :, None, :],
                         (length, height, width, d3))
    ex = np.broadcast_to(_sine_embed(x, d3, temperature)[None, None, :, :],
                         (length, height, width, d3))
    return jnp.asarray(np.concatenate([et, ey, ex], axis=-1), dtype=dtype)
