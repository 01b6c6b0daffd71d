"""Window partitioning for local spatial attention.

The reference does this with einops rearranges plus a center-pad helper
(reference: model/VidHRFormer_modules.py:444-561). Here it is a pair of
static reshape/transposes, which XLA lowers to free layout changes. For the
shipped configs (8x8 latents, window 4) no padding is needed; the center-pad
path is kept for odd sizes and matches PadBlock semantics
(reference: VidHRFormer_modules.py:538-561).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def pad_to_window(x: jnp.ndarray, window: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Center-pad (..., H, W, C) so H and W divide by ``window``.

    Returns the padded array and the (top, left) pad offsets used to undo it.
    """
    h, w = x.shape[-3], x.shape[-2]
    pad_h = (-h) % window
    pad_w = (-w) % window
    if pad_h == 0 and pad_w == 0:
        return x, (0, 0)
    cfg = [(0, 0)] * (x.ndim - 3)
    cfg += [(pad_h // 2, pad_h - pad_h // 2),
            (pad_w // 2, pad_w - pad_w // 2), (0, 0)]
    return jnp.pad(x, cfg), (pad_h // 2, pad_w // 2)


def unpad_from_window(x: jnp.ndarray, orig_hw: Tuple[int, int],
                      offsets: Tuple[int, int]) -> jnp.ndarray:
    """Undo :func:`pad_to_window` on (..., H_pad, W_pad, C)."""
    h, w = orig_hw
    top, left = offsets
    if x.shape[-3] == h and x.shape[-2] == w:
        return x
    return x[..., top:top + h, left:left + w, :]


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nWh * nWw, window*window, C).

    Token order inside each window is row-major over (ph, pw) and window order
    is row-major over (qh, qw), matching the reference's
    ``n (qh ph) (qw pw) c -> (ph pw) (n qh qw) c`` rearrange
    (reference: VidHRFormer_modules.py:503-512) modulo the batch-major
    transpose (we keep batch leading: better for TPU layout).
    """
    b, h, w, c = x.shape
    nh, nw = h // window, w // window
    x = x.reshape(b, nh, window, nw, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (b, nh, nw, ph, pw, c)
    return x.reshape(b * nh * nw, window * window, c)


def window_reverse(x: jnp.ndarray, window: int, hw: Tuple[int, int]) -> jnp.ndarray:
    """Inverse of :func:`window_partition`: (B*nW, win*win, C) -> (B, H, W, C)."""
    h, w = hw
    nh, nw = h // window, w // window
    b = x.shape[0] // (nh * nw)
    c = x.shape[-1]
    x = x.reshape(b, nh, nw, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (b, nh, ph, nw, pw, c)
    return x.reshape(b, h, w, c)


def temporal_window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B * nWh * nWw, T * window * window, C).

    Gathers each spatial window's tokens across ALL timesteps into one
    sequence — the TSLMA layout (reference: VidHRFormer_modules.py:454-470,
    ``n t (qh ph) (qw pw) c -> (t ph pw) (n qh qw) c``), batch-major here.
    """
    b, t, h, w, c = x.shape
    nh, nw = h // window, w // window
    x = x.reshape(b, t, nh, window, nw, window, c)
    x = x.transpose(0, 2, 4, 1, 3, 5, 6)  # (b, nh, nw, t, ph, pw, c)
    return x.reshape(b * nh * nw, t * window * window, c)


def temporal_window_reverse(x: jnp.ndarray, window: int, t: int,
                            hw: Tuple[int, int]) -> jnp.ndarray:
    """Inverse of :func:`temporal_window_partition`."""
    h, w = hw
    nh, nw = h // window, w // window
    b = x.shape[0] // (nh * nw)
    c = x.shape[-1]
    x = x.reshape(b, nh, nw, t, window, window, c)
    x = x.transpose(0, 3, 1, 4, 2, 5, 6)  # (b, t, nh, ph, nw, pw, c)
    return x.reshape(b, t, h, w, c)
