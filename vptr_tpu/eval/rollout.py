"""Inference rollouts: FAR autoregressive + NAR block chaining, as lax.scan.

The reference implements these as Python loops with *growing* context and a
sliding window once the context exceeds Tp+Tf (reference: Test_VPTR.ipynb
``FAR_RIP_test_single_iter`` / ``FAR_RIL_test_single_iter`` /
``NAR_test_single_iter``; duplicated at train_FAR.py:103-134). Growing
shapes retrace under jit, so here the context is a fixed-size ring buffer of
Tp+Tf latent slots:

* while the buffer is not full, new predictions are written at the next free
  slot (the growing-context phase);
* once full, the buffer shifts left by one frame per step (the reference's
  ``input_feats = input_feats[:, 1:, ...]`` sliding window).

FAR causality makes this exact: outputs at valid positions cannot read the
unused tail slots, so one compiled scan covers both phases.

Three modes:
* ``far_rollout_pixel`` (RIP) — decode each predicted latent to pixels and
  re-encode (the canonical, better-scoring mode);
* ``far_rollout_latent`` (RIL) — feed latents straight back (the reference
  notes it scores worse; kept for parity);
* ``nar_rollout`` — chain NAR blocks of Tf frames, feeding predicted latents
  back as the next context.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def _write_frame(buf: jnp.ndarray, feat: jnp.ndarray,
                 count: jnp.ndarray, capacity: int):
    """Append one frame-latent to the ring buffer: fill while below capacity,
    then shift-left-and-write-last (the sliding window)."""
    full = count >= capacity
    shifted = jnp.roll(buf, -1, axis=1)
    buf = jnp.where(full, shifted, buf)
    idx = jnp.where(full, capacity - 1, count)
    buf = lax.dynamic_update_slice_in_dim(buf, feat, idx, axis=1)
    return buf, jnp.minimum(count + 1, capacity)


def _far_rollout(enc_fn, dec_fn, tr_fn, past_frames, num_pred: int,
                 context: int, reencode: bool):
    feats = enc_fn(past_frames)
    n, tp = feats.shape[:2]
    h, w, c = feats.shape[2:]
    buf = jnp.zeros((n, context) + (h, w, c), feats.dtype)
    buf = lax.dynamic_update_slice_in_dim(buf, feats, 0, axis=1)
    count = jnp.asarray(tp, jnp.int32)

    def body(carry, _):
        buf, count = carry
        pred = tr_fn(buf)                       # (N, context, h, w, c)
        # output at the last valid position predicts the next frame
        last = lax.dynamic_slice_in_dim(pred, count - 1, 1, axis=1)
        frame = dec_fn(last)                    # (N, 1, H, W, C_img)
        feat = enc_fn(frame) if reencode else last
        buf, count = _write_frame(buf, feat, count, context)
        return (buf, count), frame[:, 0]

    (_, _), frames = lax.scan(body, (buf, count), None, length=num_pred)
    return jnp.moveaxis(frames, 0, 1)           # (N, num_pred, H, W, C)


def far_rollout_pixel(enc_fn: Callable, dec_fn: Callable, tr_fn: Callable,
                      past_frames: jnp.ndarray, num_pred: int,
                      context: int) -> jnp.ndarray:
    """FAR-RIP: pixel-space recurrence — decode -> re-encode each step
    (reference: Test_VPTR.ipynb FAR_RIP_test_single_iter)."""
    return _far_rollout(enc_fn, dec_fn, tr_fn, past_frames, num_pred,
                        context, reencode=True)


def far_rollout_latent(enc_fn: Callable, dec_fn: Callable, tr_fn: Callable,
                       past_frames: jnp.ndarray, num_pred: int,
                       context: int) -> jnp.ndarray:
    """FAR-RIL: latent recurrence, no re-encode (reference notes this scores
    worse; Test_VPTR.ipynb FAR_RIL_test_single_iter)."""
    return _far_rollout(enc_fn, dec_fn, tr_fn, past_frames, num_pred,
                        context, reencode=False)


def nar_rollout(enc_fn: Callable, dec_fn: Callable, tr_fn: Callable,
                past_frames: jnp.ndarray, num_pred: int,
                num_future: int) -> jnp.ndarray:
    """Chain NAR blocks: each block predicts Tf latents from the current
    context; predictions become the next context (reference:
    Test_VPTR.ipynb NAR_test_single_iter and the BAIR 2->28 variant, which
    chains 10+10+8 and keeps the leading frames of the last block).

    The context holds the last Tp frames of (past + predictions).
    """
    feats = enc_fn(past_frames)
    tp = feats.shape[1]
    num_blocks = -(-num_pred // num_future)

    def body(context, _):
        pred = tr_fn(context)                   # (N, Tf, h, w, c)
        joint = jnp.concatenate([context, pred], axis=1)
        return joint[:, -tp:], pred

    if num_blocks == 1:
        preds = tr_fn(feats)[:, None]
    else:
        _, preds = lax.scan(body, feats, None, length=num_blocks)
        preds = jnp.moveaxis(preds, 0, 1)       # (N, blocks, Tf, h, w, c)
    n = preds.shape[0]
    flat = preds.reshape((n, -1) + preds.shape[3:])[:, :num_pred]
    return dec_fn(flat)


def make_rollout_fns(enc, dec, transformer, enc_vars, dec_vars, t_vars):
    """Bind module applies into pure (feats|frames) -> array functions."""
    enc_fn = partial(enc.apply, enc_vars, train=False)
    dec_fn = partial(dec.apply, dec_vars, train=False)
    tr_fn = partial(transformer.apply, t_vars, train=False)
    return enc_fn, dec_fn, tr_fn
