"""Training criterion: MSE / L1 / GDL / GAN / BiPatchNCE + schedules.

Pure functions over pytrees — no stateful Module wrappers. Behavior parity
with the reference criterion (reference: model/criterion.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


def temporal_weight(t: int) -> jnp.ndarray:
    """Exp-increasing per-timestep weight: exp(log(T)/(T-1) * t)
    (reference: criterion.py:8-13). Shape (T,); w[0]=1, w[-1]=T."""
    if t == 1:
        return jnp.ones((1,), jnp.float32)
    steps = np.arange(t, dtype=np.float64)
    beta = np.log(t) / (t - 1)
    return jnp.asarray(np.exp(beta * steps), jnp.float32)


def _l2_normalize(x, axis, eps=1e-12):
    """torch F.normalize(p=2) semantics: x / max(||x||, eps)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def l2_normalize_channels(x):
    """L2-normalize (..., C) features over the channel axis — the NAR NCE
    pre-processing (reference: train_NAR.py:36, F.normalize(dim=2) on NCHW)."""
    return _l2_normalize(x.astype(jnp.float32), axis=-1)


def _weighted_mean(err, weights: Optional[jnp.ndarray]):
    """Mean of ``err`` (B, T, ...) with optional per-timestep weights
    (reference: criterion.py:96-102)."""
    if weights is not None:
        shape = (1, -1) + (1,) * (err.ndim - 2)
        err = err * weights.reshape(shape).astype(err.dtype)
    return jnp.mean(err)


def mse_loss(gt, pred, weights=None, norm_axis=None):
    """(reference: criterion.py:105-132)."""
    gt = gt.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    if norm_axis is not None:
        gt = _l2_normalize(gt, norm_axis)
        pred = _l2_normalize(pred, norm_axis)
    return _weighted_mean(jnp.square(pred - gt), weights)


def l1_loss(gt, pred, weights=None, norm_axis=None):
    """(reference: criterion.py:76-103)."""
    gt = gt.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    if norm_axis is not None:
        gt = _l2_normalize(gt, norm_axis)
        pred = _l2_normalize(pred, norm_axis)
    return _weighted_mean(jnp.abs(pred - gt), weights)


def gdl_loss(gt, pred, alpha: float = 1.0, weights=None):
    """Gradient-difference loss on (N, T, H, W, C) frames
    (reference: criterion.py:134-204, NHWC here instead of NCHW).

    |d_H gt - d_H pred|^alpha averaged + same for d_W.
    """
    gt = gt.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    gt_dh = jnp.abs(gt[..., 1:, :, :] - gt[..., :-1, :, :])
    pr_dh = jnp.abs(pred[..., 1:, :, :] - pred[..., :-1, :, :])
    gt_dw = jnp.abs(gt[..., :, 1:, :] - gt[..., :, :-1, :])
    pr_dw = jnp.abs(pred[..., :, 1:, :] - pred[..., :, :-1, :])
    g1 = jnp.abs(gt_dh - pr_dh)
    g2 = jnp.abs(gt_dw - pr_dw)
    if alpha != 1.0:
        g1 = jnp.power(g1, alpha)
        g2 = jnp.power(g2, alpha)
    return _weighted_mean(g1, weights) + _weighted_mean(g2, weights)


def gan_loss(logits, target_is_real: bool, mode: str = "vanilla"):
    """GAN objective on discriminator patch logits
    (reference: criterion.py:15-74).

    vanilla: BCE-with-logits against all-real/all-fake labels;
    lsgan: MSE against the labels; wgangp: +-mean(logits).
    """
    logits = logits.astype(jnp.float32)
    if mode == "vanilla":
        label = jnp.ones_like(logits) if target_is_real else jnp.zeros_like(logits)
        return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, label))
    if mode == "lsgan":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean(jnp.square(logits - target))
    if mode == "wgangp":
        return -jnp.mean(logits) if target_is_real else jnp.mean(logits)
    raise ValueError(f"unknown gan mode {mode!r}")


def bi_patch_nce(gt_f, pred_f, temperature: float = 0.07):
    """Bidirectional patchwise InfoNCE over spatial latent patches
    (reference: criterion.py:206-259).

    gt_f, pred_f: (N, T, h, w, C) projected features. Positives are
    same-position patches; gradients are stopped through negatives (the
    reference's ``.detach()`` on the off-diagonal matmul, criterion.py:239,245).
    """
    n, t, h, w, c = gt_f.shape
    gt = gt_f.reshape(n * t, h * w, c).astype(jnp.float32)
    pr = pred_f.reshape(n * t, h * w, c).astype(jnp.float32)
    eye = jnp.eye(h * w, dtype=jnp.float32)

    def direction(a, b):
        # diagonal: full gradient; off-diagonal: b detached
        diag = jnp.einsum("bpc,bpc->bp", a, b)                       # (B, P)
        full = jnp.einsum("bpc,bqc->bpq", a, jax.lax.stop_gradient(b))
        logits = full * (1.0 - eye) + diag[..., None] * eye
        logits = logits / temperature
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.einsum("bpq,pq->bp", logp, eye))

    return 0.5 * (direction(gt, pr) + direction(pr, gt))


def noam_schedule(d_model: int, factor: float = 2.0,
                  warmup_steps: int = 4000) -> optax.Schedule:
    """Noam warmup: factor * d^-0.5 * min(step^-0.5, step * warmup^-1.5)
    (reference: criterion.py:262-296)."""

    def schedule(count):
        step = jnp.maximum(count, 1).astype(jnp.float32)
        return (factor * d_model ** -0.5 *
                jnp.minimum(step ** -0.5, step * warmup_steps ** -1.5))

    return schedule


def build_optimizer(cfg, d_model: int = 528) -> optax.GradientTransformation:
    """optax chain from an OptimConfig: optional clip-by-global-norm +
    adam/adamw with the reference's hyperparameters
    (reference: train_FAR.py:197 AdamW; train_AutoEncoder.py:137-139
    Adam(0.5, 0.999); clip at train_FAR.py:82)."""
    if cfg.schedule == "noam":
        lr = noam_schedule(d_model, cfg.noam_factor, cfg.noam_warmup_steps)
    else:
        lr = cfg.lr
    mu_dtype = jnp.dtype(getattr(cfg, "mu_dtype", "float32"))
    if cfg.optimizer == "adamw":
        opt = optax.adamw(lr, b1=cfg.b1, b2=cfg.b2,
                          weight_decay=cfg.weight_decay, mu_dtype=mu_dtype)
    elif cfg.optimizer == "adam":
        opt = optax.adam(lr, b1=cfg.b1, b2=cfg.b2, mu_dtype=mu_dtype)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    if cfg.max_grad_norm is not None:
        return optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), opt)
    return opt
