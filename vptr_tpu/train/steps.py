"""Jitted training/eval steps for all three stages.

The reference's alternating GAN update mutates ``requires_grad`` flags between
two ``backward()`` calls (reference: train_AutoEncoder.py:59-74,
train_FAR.py:65-83). Under jit that becomes an explicit dataflow program:

1. one ``jax.vjp`` through the generator forward (transformer/AE + decoder),
2. discriminator step on the stop-gradient'd fake frames (D sees the frames
   exactly once, as upstream),
3. generator loss evaluated against the *updated* discriminator (matching the
   reference's D-then-G order), pulled back through the saved vjp.

The generator forward therefore runs once per step; no retracing, no flags.
Batch-norm stats thread through as explicit collections.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from vptr_tpu.losses import (
    bi_patch_nce,
    gan_loss,
    gdl_loss,
    l2_normalize_channels,
    mse_loss,
    temporal_weight,
)
from vptr_tpu.train.state import AETrainState, ModuleState, Stage2TrainState


def _flat_frames(x):
    """(N, T, H, W, C) -> (N*T, H, W, C) for the per-frame discriminator
    (reference flattens the same way, train_AutoEncoder.py:22-26)."""
    return x.reshape((-1,) + x.shape[2:])


def _disc_update(disc, d_opt, disc_state: ModuleState, d_opt_state,
                 fake_frames, real_frames, lam_gan: float, gan_mode: str):
    """One discriminator step on detached fakes
    (reference: cal_lossD, train_AutoEncoder.py:21-30)."""
    fake = jax.lax.stop_gradient(_flat_frames(fake_frames))
    real = _flat_frames(real_frames)

    def d_loss_fn(d_params):
        variables = {"params": d_params}
        if disc_state.stats:
            variables["batch_stats"] = disc_state.stats
        mutable = ["batch_stats"] if disc_state.stats else []
        pred_fake, aux1 = disc.apply(variables, fake, train=True,
                                     mutable=mutable)
        if mutable:
            # running stats update SEQUENTIALLY, exactly like the
            # reference's two successive netD forwards in train mode
            # (train_AutoEncoder.py:22-26): the real pass sees the fake
            # pass's updated stats
            variables = {"params": d_params,
                         "batch_stats": aux1["batch_stats"]}
        pred_real, aux2 = disc.apply(variables, real, train=True,
                                     mutable=mutable)
        loss_fake = gan_loss(pred_fake, False, gan_mode)
        loss_real = gan_loss(pred_real, True, gan_mode)
        loss_d = (loss_fake + loss_real) * 0.5 * lam_gan
        new_stats = aux2.get("batch_stats", {}) if mutable else {}
        return loss_d, (loss_fake, loss_real, new_stats)

    (loss_d, (lf, lr, new_stats)), grads = jax.value_and_grad(
        d_loss_fn, has_aux=True)(disc_state.params)
    updates, new_opt = d_opt.update(grads, d_opt_state, disc_state.params)
    new_params = optax.apply_updates(disc_state.params, updates)
    new_disc = ModuleState(params=new_params,
                           stats=new_stats or disc_state.stats)
    metrics = {"Dtotal": loss_d, "Dfake": lf, "Dreal": lr}
    return new_disc, new_opt, metrics


def _gan_term(disc, disc_state: ModuleState, frames, gan_mode: str,
              train: bool = False):
    """Generator-side GAN term, D params frozen. ``train=True`` matches the
    reference's module mode during training — the discriminator stays in
    train() for cal_lossG/cal_lossT (train_AutoEncoder.py:52-73,
    train_FAR.py:68-80), so BatchNorm normalizes with BATCH stats and the
    running stats update on this third per-step forward too. Returns
    (loss, new_stats); eval passes train=False (reference: netD.eval())."""
    variables = disc_state.variables()
    flat = _flat_frames(frames)
    if train and disc_state.stats:
        logits, aux = disc.apply(variables, flat, train=True,
                                 mutable=["batch_stats"])
        return gan_loss(logits, True, gan_mode), aux["batch_stats"]
    logits = disc.apply(variables, flat, train=train)
    return gan_loss(logits, True, gan_mode), disc_state.stats


# ---------------------------------------------------------------------------
# Stage 1 — autoencoder (reference: train_AutoEncoder.py:44-86)
# ---------------------------------------------------------------------------

def make_ae_train_step(enc, dec, disc, g_opt, d_opt, loss_cfg
                       ) -> Callable[[AETrainState, Any, Any],
                                     Tuple[AETrainState, Dict]]:
    lam_gan = loss_cfg.lam_gan
    gan_mode = loss_cfg.gan_mode
    use_gan = disc is not None and lam_gan is not None

    def step(state: AETrainState, past, future):
        rng, drop = jax.random.split(state.rng)
        x = jnp.concatenate([past, future], axis=1)

        def forward(g_params):
            enc_p, dec_p = g_params
            enc_vars = {"params": enc_p}
            dec_vars = {"params": dec_p}
            enc_mut, dec_mut = [], []
            if state.enc.stats:
                enc_vars["batch_stats"] = state.enc.stats
                enc_mut = ["batch_stats"]
            if state.dec.stats:
                dec_vars["batch_stats"] = state.dec.stats
                dec_mut = ["batch_stats"]
            feats, enc_new = enc.apply(enc_vars, x, train=True,
                                       mutable=enc_mut,
                                       rngs={"dropout": drop})
            rec, dec_new = dec.apply(dec_vars, feats, train=True,
                                     mutable=dec_mut)
            return rec, (enc_new.get("batch_stats", {}),
                         dec_new.get("batch_stats", {}))

        g_params = (state.enc.params, state.dec.params)
        rec, pullback, (enc_stats, dec_stats) = jax.vjp(
            forward, g_params, has_aux=True)

        # --- discriminator first (reference order) ---
        d_metrics = {"Dtotal": 0.0, "Dfake": 0.0, "Dreal": 0.0}
        new_disc, new_d_opt = state.disc, state.d_opt
        if use_gan:
            new_disc, new_d_opt, d_metrics = _disc_update(
                disc, d_opt, state.disc, state.d_opt, rec, x, lam_gan,
                gan_mode)

        # --- generator loss against the UPDATED discriminator ---
        def g_loss_fn(rec_frames):
            l_gan, d_stats = 0.0, None
            l_mse = mse_loss(x, rec_frames)
            l_gdl = gdl_loss(x, rec_frames, alpha=loss_cfg.gdl_alpha)
            if use_gan:
                l_gan, d_stats = _gan_term(disc, new_disc, rec_frames,
                                           gan_mode, train=True)
            total = l_mse + l_gdl + (lam_gan * l_gan if use_gan else 0.0)
            return total, (l_mse, l_gdl, l_gan, d_stats)

        (g_total, (l_mse, l_gdl, l_gan, d_stats)), out_grad = \
            jax.value_and_grad(g_loss_fn, has_aux=True)(rec)
        if use_gan and d_stats:
            new_disc = new_disc.replace(stats=d_stats)
        (enc_grads, dec_grads), = pullback(out_grad)

        updates, new_g_opt = g_opt.update(
            (enc_grads, dec_grads), state.g_opt,
            (state.enc.params, state.dec.params))
        new_enc_p, new_dec_p = optax.apply_updates(
            (state.enc.params, state.dec.params), updates)

        new_state = state.replace(
            step=state.step + 1, rng=rng,
            enc=ModuleState(new_enc_p, enc_stats or state.enc.stats),
            dec=ModuleState(new_dec_p, dec_stats or state.dec.stats),
            disc=new_disc, g_opt=new_g_opt, d_opt=new_d_opt)
        metrics = {"AE_MSE": l_mse, "AE_GDL": l_gdl, "AEgan": l_gan,
                   "AE_total": g_total, **d_metrics}
        return new_state, metrics

    return step


def make_ae_eval_step(enc, dec, disc, loss_cfg):
    lam_gan = loss_cfg.lam_gan
    use_gan = disc is not None and lam_gan is not None

    def step(state: AETrainState, past, future):
        x = jnp.concatenate([past, future], axis=1)
        feats = enc.apply(state.enc.variables(), x, train=False)
        rec = dec.apply(state.dec.variables(), feats, train=False)
        l_mse = mse_loss(x, rec)
        l_gdl = gdl_loss(x, rec, alpha=loss_cfg.gdl_alpha)
        metrics = {"AE_MSE": l_mse, "AE_GDL": l_gdl,
                   "AE_total": l_mse + l_gdl}
        if use_gan:
            l_gan, _ = _gan_term(disc, state.disc, rec, loss_cfg.gan_mode)
            metrics["AEgan"] = l_gan
            metrics["AE_total"] = metrics["AE_total"] + lam_gan * l_gan
        return metrics, rec

    return step


# ---------------------------------------------------------------------------
# Stage 2 — FAR (reference: train_FAR.py:48-101)
# ---------------------------------------------------------------------------

def make_far_train_step(enc, dec, transformer, disc, t_opt, d_opt, loss_cfg,
                        remat_decoder: bool = False):
    lam_gan = loss_cfg.lam_gan
    gan_mode = loss_cfg.gan_mode
    use_gan = disc is not None and lam_gan is not None

    def step(state: Stage2TrainState, past, future):
        rng, drop = jax.random.split(state.rng)
        # teacher forcing: feed [past, future[:-1]], predict shift-by-one
        x = jnp.concatenate([past, future[:, :-1]], axis=1)
        gt_feats = enc.apply(state.enc.variables(), x, train=False)
        gt_feats = jax.lax.stop_gradient(gt_feats)
        target = jnp.concatenate([past[:, 1:], future], axis=1)
        weights = (temporal_weight(target.shape[1])
                   if loss_cfg.temporal_weight else None)

        def forward(t_params):
            t_vars = {"params": t_params}
            mut = []
            if state.transformer.stats:
                t_vars["batch_stats"] = state.transformer.stats
                mut = ["batch_stats"]
            pred_feats, new_vars = transformer.apply(
                t_vars, gt_feats, train=True, mutable=mut,
                rngs={"dropout": drop})
            # grads flow THROUGH the frozen decoder (train_FAR.py:62-63);
            # rematerialize its activations in backward when asked (the
            # 64x64 conv intermediates dominate HBM at large batch)
            dec_apply = lambda f: dec.apply(state.dec.variables(), f,
                                            train=False)
            if remat_decoder:
                dec_apply = jax.checkpoint(dec_apply)
            pred_frames = dec_apply(pred_feats)
            return pred_frames, new_vars.get("batch_stats", {})

        pred_frames, pullback, t_stats = jax.vjp(
            forward, state.transformer.params, has_aux=True)

        d_metrics = {"Dtotal": 0.0, "Dfake": 0.0, "Dreal": 0.0}
        new_disc, new_d_opt = state.disc, state.d_opt
        if use_gan:
            # D sees the FULL teacher-forced prediction (Tp+Tf-1 frames) as
            # fake vs the Tf future frames as real, exactly as upstream
            # (reference: train_FAR.py:72 — cal_lossD(Disc, pred_frames,
            # future_frames); the per-frame PatchGAN never compares them
            # pairwise, so the frame counts may differ)
            new_disc, new_d_opt, d_metrics = _disc_update(
                disc, d_opt, state.disc, state.d_opt,
                pred_frames, future, lam_gan, gan_mode)

        def t_loss_fn(pred):
            l_gan, d_stats = 0.0, None
            l_mse = mse_loss(pred, target, weights=weights)
            l_gdl = gdl_loss(target, pred, alpha=loss_cfg.gdl_alpha,
                             weights=weights)
            if use_gan:
                l_gan, d_stats = _gan_term(disc, new_disc, pred, gan_mode,
                                           train=True)
            total = l_gdl + l_mse + (lam_gan * l_gan if use_gan else 0.0)
            return total, (l_mse, l_gdl, l_gan, d_stats)

        (total, (l_mse, l_gdl, l_gan, d_stats)), out_grad = \
            jax.value_and_grad(t_loss_fn, has_aux=True)(pred_frames)
        if use_gan and d_stats:
            new_disc = new_disc.replace(stats=d_stats)
        t_grads, = pullback(out_grad)

        updates, new_t_opt = t_opt.update(t_grads, state.t_opt,
                                          state.transformer.params)
        new_t_params = optax.apply_updates(state.transformer.params, updates)

        new_state = state.replace(
            step=state.step + 1, rng=rng,
            transformer=ModuleState(new_t_params,
                                    t_stats or state.transformer.stats),
            t_opt=new_t_opt, disc=new_disc, d_opt=new_d_opt)
        metrics = {"T_MSE": l_mse, "T_GDL": l_gdl, "T_gan": l_gan,
                   "T_total": total, **d_metrics}
        return new_state, metrics

    return step


def make_far_eval_step(enc, dec, transformer, loss_cfg):
    def step(state: Stage2TrainState, past, future):
        x = jnp.concatenate([past, future[:, :-1]], axis=1)
        gt_feats = enc.apply(state.enc.variables(), x, train=False)
        pred_feats = transformer.apply(state.transformer.variables(),
                                       gt_feats, train=False)
        pred_frames = dec.apply(state.dec.variables(), pred_feats,
                                train=False)
        target = jnp.concatenate([past[:, 1:], future], axis=1)
        l_mse = mse_loss(pred_frames, target)
        l_gdl = gdl_loss(target, pred_frames, alpha=loss_cfg.gdl_alpha)
        return ({"T_MSE": l_mse, "T_GDL": l_gdl, "T_total": l_mse + l_gdl},
                pred_frames)

    return step


# ---------------------------------------------------------------------------
# Stage 2 — NAR (reference: train_NAR.py:49-107)
# ---------------------------------------------------------------------------

def make_nar_train_step(enc, dec, transformer, disc, t_opt, d_opt, loss_cfg,
                        remat_decoder: bool = False):
    lam_gan = loss_cfg.lam_gan
    lam_nce = loss_cfg.lam_nce
    gan_mode = loss_cfg.gan_mode
    use_gan = disc is not None and lam_gan is not None
    use_nce = lam_nce is not None

    def step(state: Stage2TrainState, past, future):
        rng, drop = jax.random.split(state.rng)
        past_feats = jax.lax.stop_gradient(
            enc.apply(state.enc.variables(), past, train=False))
        future_feats = jax.lax.stop_gradient(
            enc.apply(state.enc.variables(), future, train=False))
        weights = (temporal_weight(future.shape[1])
                   if loss_cfg.temporal_weight else None)

        def forward(t_params):
            t_vars = {"params": t_params}
            mut = []
            if state.transformer.stats:
                t_vars["batch_stats"] = state.transformer.stats
                mut = ["batch_stats"]
            pred_feats, new_vars = transformer.apply(
                t_vars, past_feats, train=True, mutable=mut,
                rngs={"dropout": drop})
            dec_apply = lambda f: dec.apply(state.dec.variables(), f,
                                            train=False)
            if remat_decoder:
                dec_apply = jax.checkpoint(dec_apply)
            pred_frames = dec_apply(pred_feats)
            proj_pred = proj_gt = None
            if use_nce:
                # project both through the NCE head (train_NAR.py:81-82)
                proj_pred = transformer.apply(
                    t_vars, pred_feats, method=transformer.nce_project,
                    mutable=False)
                proj_gt = transformer.apply(
                    t_vars, future_feats, method=transformer.nce_project,
                    mutable=False)
            return (pred_frames, proj_pred, proj_gt), new_vars.get(
                "batch_stats", {})

        (pred_frames, proj_pred, proj_gt), pullback, t_stats = jax.vjp(
            forward, state.transformer.params, has_aux=True)

        d_metrics = {"Dtotal": 0.0, "Dfake": 0.0, "Dreal": 0.0}
        new_disc, new_d_opt = state.disc, state.d_opt
        if use_gan:
            new_disc, new_d_opt, d_metrics = _disc_update(
                disc, d_opt, state.disc, state.d_opt, pred_frames, future,
                lam_gan, gan_mode)

        def t_loss_fn(outs):
            pred, p_pred, p_gt = outs
            l_mse = mse_loss(pred, future, weights=weights)
            l_gdl = gdl_loss(future, pred, alpha=loss_cfg.gdl_alpha,
                             weights=weights)
            l_nce = 0.0
            if use_nce:
                # L2-normalize over channels before the InfoNCE
                # (train_NAR.py:36: F.normalize(dim=2) on (N,T,C,h,w))
                l_nce = bi_patch_nce(l2_normalize_channels(p_gt),
                                     l2_normalize_channels(p_pred),
                                     loss_cfg.nce_temperature)
            l_gan, d_stats = 0.0, None
            if use_gan:
                l_gan, d_stats = _gan_term(disc, new_disc, pred, gan_mode,
                                           train=True)
            total = l_gdl + l_mse
            if use_nce:
                total = total + lam_nce * l_nce
            if use_gan:
                total = total + lam_gan * l_gan
            return total, (l_mse, l_gdl, l_nce, l_gan, d_stats)

        (total, (l_mse, l_gdl, l_nce, l_gan, d_stats)), out_grad = \
            jax.value_and_grad(t_loss_fn, has_aux=True)(
                (pred_frames, proj_pred, proj_gt))
        if use_gan and d_stats:
            new_disc = new_disc.replace(stats=d_stats)
        t_grads, = pullback(out_grad)

        updates, new_t_opt = t_opt.update(t_grads, state.t_opt,
                                          state.transformer.params)
        new_t_params = optax.apply_updates(state.transformer.params, updates)

        new_state = state.replace(
            step=state.step + 1, rng=rng,
            transformer=ModuleState(new_t_params,
                                    t_stats or state.transformer.stats),
            t_opt=new_t_opt, disc=new_disc, d_opt=new_d_opt)
        metrics = {"T_MSE": l_mse, "T_GDL": l_gdl, "T_bpc": l_nce,
                   "T_gan": l_gan, "T_total": total, **d_metrics}
        return new_state, metrics

    return step


def make_nar_eval_step(enc, dec, transformer, loss_cfg):
    # The reference's NAR validation computes the BiPatchNCE term too —
    # single_iter(train_flag=False) projects pred/gt feats through the NCE
    # head and folds lam_pc * T_bpc into loss_T exactly as in training
    # (reference: train_NAR.py:92-104 with cal_lossT train_NAR.py:49-62) —
    # so val T_total here must include it to be reference-comparable.
    lam_nce = loss_cfg.lam_nce
    use_nce = lam_nce is not None

    def step(state: Stage2TrainState, past, future):
        past_feats = enc.apply(state.enc.variables(), past, train=False)
        pred_feats = transformer.apply(state.transformer.variables(),
                                       past_feats, train=False)
        pred_frames = dec.apply(state.dec.variables(), pred_feats,
                                train=False)
        l_mse = mse_loss(pred_frames, future)
        l_gdl = gdl_loss(future, pred_frames, alpha=loss_cfg.gdl_alpha)
        total = l_mse + l_gdl
        metrics = {"T_MSE": l_mse, "T_GDL": l_gdl}
        if use_nce:
            future_feats = enc.apply(state.enc.variables(), future,
                                     train=False)
            t_vars = state.transformer.variables()
            proj_pred = transformer.apply(
                t_vars, pred_feats, method=transformer.nce_project,
                mutable=False)
            proj_gt = transformer.apply(
                t_vars, future_feats, method=transformer.nce_project,
                mutable=False)
            l_nce = bi_patch_nce(l2_normalize_channels(proj_gt),
                                 l2_normalize_channels(proj_pred),
                                 loss_cfg.nce_temperature)
            metrics["T_bpc"] = l_nce
            total = total + lam_nce * l_nce
        metrics["T_total"] = total
        return metrics, pred_frames

    return step
