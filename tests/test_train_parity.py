"""One-step TRAIN parity vs torch: loss components AND gradients.

Module-level forward parity (test_torch_parity.py) pins the math; these
tests pin the RECIPE WIRING — the class of bug a per-module test cannot
see (a loss term missing from the total, the NCE projector outside the
grad path, grads not flowing through the frozen decoder, the D-then-G
ordering, a recipe constant the reference's train scripts override).

Protocol per stage: build the reference architecture in torch (the
re-derivations from test_torch_parity), random-init, import the weights
through ``vptr_tpu.utils.torch_import``, run ONE training step on an
identical batch — f32, dropout/drop-path 0, the reference's recipe
constants — in both frameworks, and assert

* every reported loss component matches an inline torch re-derivation of
  the reference's cal_loss*/single_iter (reference: train_NAR.py:33-107,
  train_FAR.py:48-101, train_AutoEncoder.py:21-86), and
* the parameter gradients match leaf-for-leaf. The jax side is recovered
  exactly from an SGD(lr=1) training step (grad = old - new), so the
  step's REAL wiring is what's tested; the torch side's ``.grad`` tensors
  are mapped through the same importers the weights went through — those
  are pure transposes/permutes/slices, hence gradient-equivariant.

The optimizer chain itself (clip-by-global-norm -> AdamW, the reference's
train_FAR.py:82+197) is pinned separately against torch in
test_optimizer_chain_matches_torch, so step-wiring parity (SGD probe) +
optimizer parity compose to full post-update parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

pytestmark = pytest.mark.slow

from test_torch_parity import (
    TorchFAR,
    TorchNAR,
    TorchVPTRDec,
    TorchVPTREnc,
    _randomize_bn,
    _sd,
)

from vptr_tpu.config import LossConfig
from vptr_tpu.models.autoencoder import VPTRDec, VPTREnc
from vptr_tpu.models.discriminator import PatchDiscriminator
from vptr_tpu.models.position import (
    position_embedding_1d,
    position_embedding_2d,
)
from vptr_tpu.models.transformer import VPTRFormerFAR, VPTRFormerNAR
from vptr_tpu.train.state import AETrainState, ModuleState, Stage2TrainState
from vptr_tpu.train.steps import (
    make_ae_train_step,
    make_far_train_step,
    make_nar_train_step,
)
from vptr_tpu.utils.torch_import import (
    import_far_transformer,
    import_nar_transformer,
    import_vptr_dec,
    import_vptr_disc,
    import_vptr_enc,
)

def _rng(seed):
    """Per-test numpy RNG: batches must not depend on test order (a
    shared module RNG makes tolerances drift with which tests ran first)."""
    return np.random.default_rng(seed)


torch.manual_seed(7)

DIM, HEADS, WIN, NRES = 48, 8, 4, 2   # tiny but full-stack geometry


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _grad_sd(module):
    """state_dict-shaped dict of .grad tensors (zeros for grad-less params,
    buffer values for buffers) — feed to the importers to map torch grads
    into the flax tree layout."""
    params = dict(module.named_parameters())
    out = {}
    for k, v in module.state_dict().items():
        p = params.get(k)
        if p is not None and p.grad is not None:
            out[k] = p.grad.detach().numpy()
        elif v.dtype.is_floating_point:
            out[k] = np.zeros(v.shape, np.float32)
        else:
            out[k] = v.numpy()
    return out


def _assert_tree_close(got, want, atol=3e-5, rtol=2e-3):
    def check(path, g, w):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=atol, rtol=rtol,
            err_msg=jax.tree_util.keystr(path))
    jax.tree_util.tree_map_with_path(check, got, want)


def _grads_from_sgd_step(old_params, new_params):
    """t_opt = optax.sgd(1.0) makes the update exactly -grad."""
    return jax.tree_util.tree_map(
        lambda a, b: np.asarray(a, np.float64) - np.asarray(b, np.float64),
        old_params, new_params)


def _t_enc(tenc, x):
    """(N,T,H,W,C) frames -> (N,T,h,w,Cf) feats through the NCHW torch enc."""
    n, t = x.shape[:2]
    f = tenc(x.flatten(0, 1).permute(0, 3, 1, 2))
    return f.permute(0, 2, 3, 1).reshape(n, t, *f.shape[2:], f.shape[1])


def _t_dec(tdec, f):
    n, t = f.shape[:2]
    y = tdec(f.flatten(0, 1).permute(0, 3, 1, 2))
    return y.permute(0, 2, 3, 1).reshape(n, t, *y.shape[2:], y.shape[1])


def _t_gdl(gt, pred):
    """GDL on channels-last clips (reference: criterion.py:134-204, a=1)."""
    g1 = torch.abs(torch.abs(gt[..., 1:, :, :] - gt[..., :-1, :, :]) -
                   torch.abs(pred[..., 1:, :, :] - pred[..., :-1, :, :]))
    g2 = torch.abs(torch.abs(gt[..., :, 1:, :] - gt[..., :, :-1, :]) -
                   torch.abs(pred[..., :, 1:, :] - pred[..., :, :-1, :]))
    return g1.mean() + g2.mean()


def _t_bpnce(gt_f, pred_f, temp):
    """BiPatchNCE at the recipe chain: F.normalize over channels on BOTH
    feature sets (train_NAR.py:36) then the bidirectional masked-matmul CE
    with negatives detached (criterion.py:227-259). Channels-last."""
    n, t, h, w, c = gt_f.shape
    tg = F.normalize(gt_f, p=2, dim=-1).reshape(n * t, h * w, c)
    tp = F.normalize(pred_f, p=2, dim=-1).reshape(n * t, h * w, c)
    mask = torch.eye(h * w).unsqueeze(0).repeat(n * t, 1, 1)
    s1 = (torch.matmul(tg, tp.transpose(1, 2)) * mask +
          torch.matmul(tg, tp.detach().transpose(1, 2)) * (1 - mask)) / temp
    s2 = (torch.matmul(tp, tg.transpose(1, 2)) * mask +
          torch.matmul(tp, tg.detach().transpose(1, 2)) * (1 - mask)) / temp
    target = torch.argmax(mask.flatten(0, 1), dim=1)
    return 0.5 * (F.cross_entropy(s1.flatten(0, 1), target) +
                  F.cross_entropy(s2.flatten(0, 1), target))


def _gan_bce(logits, real: bool):
    """'vanilla' GANLoss (reference: criterion.py:15-74)."""
    tgt = torch.ones_like(logits) if real else torch.zeros_like(logits)
    return F.binary_cross_entropy_with_logits(logits, tgt)


def _ae_pair(img_ch=1, out="Sigmoid"):
    tenc = TorchVPTREnc(img_ch=img_ch, feat_dim=DIM, n_res=NRES)
    tdec = TorchVPTRDec(img_ch=img_ch, feat_dim=DIM, out_layer=out)
    _randomize_bn(tenc)
    _randomize_bn(tdec)
    enc = VPTREnc(img_channels=img_ch, feat_dim=DIM, n_downsampling=3,
                  n_res_blocks=NRES)
    dec = VPTRDec(img_channels=img_ch, n_downsampling=3,
                  out_layer=out.lower())
    enc_vars = jax.tree_util.tree_map(
        jnp.asarray, import_vptr_enc(_sd(tenc), n_res_blocks=NRES))
    dec_vars = jax.tree_util.tree_map(
        jnp.asarray, import_vptr_dec(_sd(tdec)))
    return tenc, tdec, enc, dec, enc_vars, dec_vars


def _clip(x):
    return np.clip(x, -1.5, 1.5).astype(np.float32)


# ---------------------------------------------------------------------------
# FAR: one train step (reference: train_FAR.py:48-101 with Disc=None,
# train_FAR.py:185 — the shipped recipe trains FAR without the GAN)
# ---------------------------------------------------------------------------

def test_far_train_step_matches_torch():
    torch.manual_seed(7)
    RNG = _rng(7)
    tp_, tf_ = 2, 3
    tenc, tdec, enc, dec, enc_vars, dec_vars = _ae_pair()
    tfar = TorchFAR(2, DIM, HEADS, WIN, 8, 8).train()
    model = VPTRFormerFAR(num_past_frames=tp_, num_future_frames=tf_,
                          d_model=DIM, num_heads=HEADS, window=WIN,
                          num_encoder_layers=2, dropout=0.0, drop_path=0.0,
                          rpe=False)
    t_vars = jax.tree_util.tree_map(
        jnp.asarray, import_far_transformer(_sd(tfar), 2, rpe=False))

    past = _clip(RNG.normal(size=(2, tp_, 64, 64, 1)) * 0.4)
    future = _clip(RNG.normal(size=(2, tf_, 64, 64, 1)) * 0.4)

    # ---- torch step (single_iter train_flag=True, optimizer_D=None) ----
    tenc.eval(), tdec.eval()
    tpast, tfuture = torch.tensor(past), torch.tensor(future)
    with torch.no_grad():
        x = torch.cat([tpast, tfuture[:, :-1]], dim=1)
        gt_feats = _t_enc(tenc, x)
    t_total = tp_ + tf_ - 1
    lw_pos = torch.tensor(np.asarray(
        position_embedding_2d(WIN, WIN, DIM), np.float32))
    temporal_pos = torch.tensor(np.asarray(
        position_embedding_1d(tp_ + tf_, DIM), np.float32))
    pred_feats = tfar(gt_feats, lw_pos, temporal_pos[:t_total])
    pred_frames = _t_dec(tdec, pred_feats)
    target = torch.cat([tpast[:, 1:], tfuture], dim=1)
    want_mse = F.mse_loss(pred_frames, target)
    want_gdl = _t_gdl(target, pred_frames)
    (want_mse + want_gdl).backward()

    # ---- our step, SGD(1.0) grad probe ----
    step = jax.jit(make_far_train_step(
        enc, dec, model, None, optax.sgd(1.0), None, LossConfig()))
    state = Stage2TrainState(
        step=jnp.zeros((), jnp.int32), rng=jax.random.PRNGKey(0),
        transformer=ModuleState.from_variables(t_vars),
        t_opt=optax.sgd(1.0).init(t_vars["params"]),
        enc=ModuleState.from_variables(enc_vars),
        dec=ModuleState.from_variables(dec_vars), disc=None, d_opt=None)
    new_state, metrics = step(state, jnp.asarray(past), jnp.asarray(future))

    assert abs(float(metrics["T_MSE"]) - want_mse.item()) < 1e-5
    assert abs(float(metrics["T_GDL"]) - want_gdl.item()) < 1e-5
    assert abs(float(metrics["T_total"])
               - (want_mse + want_gdl).item()) < 2e-5
    got = _grads_from_sgd_step(t_vars["params"],
                               new_state.transformer.params)
    want = import_far_transformer(_grad_sd(tfar), 2, rpe=False)["params"]
    _assert_tree_close(got, want)


# ---------------------------------------------------------------------------
# NAR: one train step at the RECIPE constants — BiPatchNCE temperature 1.0
# (train_NAR.py:213), lam_pc 0.1 (train_NAR.py:174), no GAN
# (train_NAR.py:195-196 commented out) — incl. the NCE-projector grads from
# BOTH the pred and the gt projection (train_NAR.py:81-83)
# ---------------------------------------------------------------------------

def test_nar_train_step_matches_torch_recipe():
    torch.manual_seed(11)
    RNG = _rng(11)
    tp_, tf_ = 2, 3
    lam_pc, temp = 0.1, 1.0
    tenc, tdec, enc, dec, enc_vars, dec_vars = _ae_pair()
    tnar = TorchNAR(1, 1, DIM, HEADS, WIN, 8, 8, tf_).train()
    _randomize_bn(tnar)
    model = VPTRFormerNAR(num_past_frames=tp_, num_future_frames=tf_,
                          d_model=DIM, num_heads=HEADS, window=WIN,
                          num_encoder_layers=1, num_decoder_layers=1,
                          dropout=0.0, drop_path=0.0, rpe=True)
    t_vars = jax.tree_util.tree_map(
        jnp.asarray, import_nar_transformer(_sd(tnar), 1, 1, rpe=True))

    past = _clip(RNG.normal(size=(2, tp_, 64, 64, 1)) * 0.4)
    future = _clip(RNG.normal(size=(2, tf_, 64, 64, 1)) * 0.4)

    # ---- torch step (single_iter train_flag=True, optimizer_D=None) ----
    tenc.eval(), tdec.eval()
    tpast, tfuture = torch.tensor(past), torch.tensor(future)
    with torch.no_grad():
        past_feats = _t_enc(tenc, tpast)
        future_feats = _t_enc(tenc, tfuture)
    lw_pos = torch.tensor(np.asarray(
        position_embedding_2d(WIN, WIN, DIM), np.float32))
    temporal_pos = torch.tensor(np.asarray(
        position_embedding_1d(tp_ + tf_, DIM), np.float32))
    pred_feats = tnar(past_feats, lw_pos, temporal_pos)
    pred_frames = _t_dec(tdec, pred_feats)
    proj_pred = tnar.NCE_projector(pred_feats)
    proj_gt = tnar.NCE_projector(future_feats)
    want_mse = F.mse_loss(pred_frames, tfuture)
    want_gdl = _t_gdl(tfuture, pred_frames)
    want_nce = _t_bpnce(proj_gt, proj_pred, temp)
    want_total = want_gdl + want_mse + lam_pc * want_nce
    want_total.backward()

    # ---- our step, SGD(1.0) grad probe ----
    loss_cfg = LossConfig(lam_nce=lam_pc, nce_temperature=temp)
    step = jax.jit(make_nar_train_step(
        enc, dec, model, None, optax.sgd(1.0), None, loss_cfg))
    state = Stage2TrainState(
        step=jnp.zeros((), jnp.int32), rng=jax.random.PRNGKey(0),
        transformer=ModuleState.from_variables(t_vars),
        t_opt=optax.sgd(1.0).init(t_vars["params"]),
        enc=ModuleState.from_variables(enc_vars),
        dec=ModuleState.from_variables(dec_vars), disc=None, d_opt=None)
    new_state, metrics = step(state, jnp.asarray(past), jnp.asarray(future))

    assert abs(float(metrics["T_MSE"]) - want_mse.item()) < 1e-5
    assert abs(float(metrics["T_GDL"]) - want_gdl.item()) < 1e-5
    assert abs(float(metrics["T_bpc"]) - want_nce.item()) < 2e-5
    assert abs(float(metrics["T_total"]) - want_total.item()) < 3e-5
    got = _grads_from_sgd_step(t_vars["params"],
                               new_state.transformer.params)
    want = import_nar_transformer(_grad_sd(tnar), 1, 1, rpe=True)["params"]
    _assert_tree_close(got, want)


# ---------------------------------------------------------------------------
# AE: one GAN train step — D-then-G order, G loss against the UPDATED
# discriminator, disc BatchNorm in train mode across all three per-step
# forwards (reference: train_AutoEncoder.py:21-86; Adam(2e-4, 0.5, 0.999)
# for D at train_AutoEncoder.py:137-139; lam_gan 0.01)
# ---------------------------------------------------------------------------

class TorchVPTRDisc(nn.Module):
    """PatchGAN re-derivation (reference: model/VPTR_modules.py:49-95,
    batch-norm case: growth convs bias-free)."""

    def __init__(self, in_ch=1, ndf=16, n_layers=3):
        super().__init__()
        seq = [nn.Conv2d(in_ch, ndf, 4, 2, 1), nn.LeakyReLU(0.2, True)]
        nf = 1
        for n in range(1, n_layers):
            nf_prev, nf = nf, min(2 ** n, 8)
            seq += [nn.Conv2d(ndf * nf_prev, ndf * nf, 4, 2, 1, bias=False),
                    nn.BatchNorm2d(ndf * nf), nn.LeakyReLU(0.2, True)]
        nf_prev, nf = nf, min(2 ** n_layers, 8)
        seq += [nn.Conv2d(ndf * nf_prev, ndf * nf, 4, 1, 1, bias=False),
                nn.BatchNorm2d(ndf * nf), nn.LeakyReLU(0.2, True),
                nn.Conv2d(ndf * nf, 1, 4, 1, 1)]
        self.model = nn.Sequential(*seq)

    def forward(self, x):
        return self.model(x)


def test_ae_gan_train_step_matches_torch():
    torch.manual_seed(13)
    RNG = _rng(13)
    lam_gan = 0.01
    tenc, tdec, enc, dec, enc_vars, dec_vars = _ae_pair()
    tdisc = TorchVPTRDisc()
    _randomize_bn(tdisc)
    disc = PatchDiscriminator(ndf=16, n_layers=3, norm="batch")
    disc_vars = jax.tree_util.tree_map(
        jnp.asarray, import_vptr_disc(_sd(tdisc), n_layers=3))

    past = _clip(RNG.normal(size=(2, 2, 64, 64, 1)) * 0.4)
    future = _clip(RNG.normal(size=(2, 3, 64, 64, 1)) * 0.4)

    # ---- torch step (single_iter train_flag=True) ----
    tenc.train(), tdec.train(), tdisc.train()
    x = torch.cat([torch.tensor(past), torch.tensor(future)], dim=1)
    rec = _t_dec(tdec, _t_enc(tenc, x))

    def flat_nchw(clips):
        return clips.flatten(0, 1).permute(0, 3, 1, 2)

    opt_d = torch.optim.Adam(tdisc.parameters(), lr=2e-4, betas=(0.5, 0.999))
    d_before = {k: v.detach().clone()
                for k, v in tdisc.state_dict().items()}
    pred_fake = tdisc(flat_nchw(rec.detach()))
    want_dfake = _gan_bce(pred_fake, False)
    pred_real = tdisc(flat_nchw(x))
    want_dreal = _gan_bce(pred_real, True)
    want_d = (want_dfake + want_dreal) * 0.5 * lam_gan
    want_d.backward()
    opt_d.step()
    for p in tdisc.parameters():
        p.requires_grad_(False)

    want_gan = _gan_bce(tdisc(flat_nchw(rec)), True)   # vs UPDATED D
    want_mse = F.mse_loss(rec, x)
    want_gdl = _t_gdl(x, rec)
    want_g = lam_gan * want_gan + want_mse + want_gdl
    want_g.backward()

    # ---- our step: SGD(1.0) grad probe for G, the real Adam for D ----
    g_opt = optax.sgd(1.0)
    d_opt = optax.adam(2e-4, b1=0.5, b2=0.999)
    loss_cfg = LossConfig(lam_gan=lam_gan, gan_mode="vanilla")
    step = jax.jit(make_ae_train_step(enc, dec, disc, g_opt, d_opt,
                                      loss_cfg))
    state = AETrainState(
        step=jnp.zeros((), jnp.int32), rng=jax.random.PRNGKey(0),
        enc=ModuleState.from_variables(enc_vars),
        dec=ModuleState.from_variables(dec_vars),
        disc=ModuleState.from_variables(disc_vars),
        g_opt=g_opt.init((enc_vars["params"], dec_vars["params"])),
        d_opt=d_opt.init(disc_vars["params"]))
    new_state, metrics = step(state, jnp.asarray(past), jnp.asarray(future))

    # GAN-term tolerances are looser than MSE/GDL's: the generator runs in
    # train mode, so BatchNorm normalizes by BATCH statistics — low-variance
    # channels amplify f32 conv noise in `rec`, and the D Adam step further
    # amplifies tiny-grad sign noise (update ~= lr*sign(g)) before the third
    # forward. Verified benign: D grads, D losses and post-Adam D params all
    # match to ~1e-6 at matched inputs; a wiring bug (missing 0.5, swapped
    # labels, stale D) would show as O(0.1).
    for key, want, tol in [("AE_MSE", want_mse, 3e-5),
                           ("AE_GDL", want_gdl, 3e-5),
                           ("AEgan", want_gan, 2e-3),
                           ("AE_total", want_g, 2e-3),
                           ("Dtotal", want_d, 1e-4),
                           ("Dfake", want_dfake, 2e-3),
                           ("Dreal", want_dreal, 2e-3)]:
        assert abs(float(metrics[key]) - want.item()) < tol, \
            (key, float(metrics[key]), want.item())

    # G grads (through the updated D) — enc and dec. atol 1e-4 (vs the
    # FAR/NAR tests' 3e-5): these grads pass through train-mode BatchNorm
    # batch-statistic divisions, which amplify f32 conv noise on
    # low-variance channels (observed worst case 5e-5 on a handful of
    # elements); a wiring bug shows as O(1e-2)
    got_enc = _grads_from_sgd_step(enc_vars["params"], new_state.enc.params)
    want_enc = import_vptr_enc(_grad_sd(tenc), n_res_blocks=NRES)["params"]
    _assert_tree_close(got_enc, want_enc, atol=1e-4)
    got_dec = _grads_from_sgd_step(dec_vars["params"], new_state.dec.params)
    want_dec = import_vptr_dec(_grad_sd(tdec))["params"]
    _assert_tree_close(got_dec, want_dec, atol=1e-4)

    # D post-Adam update parity (pins the D grads AND the Adam step):
    # compare the torch post-step disc weights mapped through the importer.
    # atol 2e-5 is a tenth of one Adam step (lr 2e-4): f32 noise in `rec`
    # perturbs near-eps grads' normalized updates by ~1e-5, while a missed,
    # doubled, or sign-flipped step shows as the full 2e-4.
    want_disc = import_vptr_disc(
        {k: v.detach().numpy() for k, v in tdisc.state_dict().items()},
        n_layers=3)["params"]
    _assert_tree_close(
        jax.tree_util.tree_map(np.asarray, new_state.disc.params),
        want_disc, atol=2e-5, rtol=1e-4)
    # and that it actually moved
    assert any(not np.allclose(v.numpy(), d_before[k].numpy())
               for k, v in tdisc.state_dict().items()
               if k.endswith("weight"))


# ---------------------------------------------------------------------------
# optimizer chain: clip-by-global-norm -> AdamW, torch defaults
# (reference: train_FAR.py:82 clip 1.0, :197 AdamW(lr=1e-4) — torch
# defaults betas (0.9, 0.999), eps 1e-8, weight_decay 0.01, which
# OptimConfig mirrors)
# ---------------------------------------------------------------------------

def test_optimizer_chain_matches_torch():
    RNG = _rng(19)
    shapes = [(5, 7), (13,), (3, 4, 2)]
    params = [RNG.normal(size=s).astype(np.float32) for s in shapes]
    # grads with global norm ~3 so the clip actually bites
    grads = [RNG.normal(size=s).astype(np.float32) for s in shapes]
    gnorm = np.sqrt(sum((g ** 2).sum() for g in grads))
    grads = [g * (3.0 / gnorm) for g in grads]

    tparams = [torch.nn.Parameter(torch.tensor(p)) for p in params]
    for p, g in zip(tparams, grads):
        p.grad = torch.tensor(g)
    nn.utils.clip_grad_norm_(tparams, max_norm=1.0, norm_type=2)
    torch.optim.AdamW(tparams, lr=1e-4).step()
    want = [p.detach().numpy() for p in tparams]

    from vptr_tpu.config import OptimConfig
    from vptr_tpu.losses import build_optimizer

    opt = build_optimizer(OptimConfig(mu_dtype="float32"))
    jparams = [jnp.asarray(p) for p in params]
    opt_state = opt.init(jparams)
    updates, _ = opt.update([jnp.asarray(g) for g in grads], opt_state,
                            jparams)
    got = optax.apply_updates(jparams, updates)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, atol=1e-7, rtol=1e-6)


# ---------------------------------------------------------------------------
# the BAIR AE recipe: ZERO padding forward parity (reference:
# train_NAR.py:171,188-189 and train_FAR_mp.py:293 build the BAIR Enc/Dec
# with padding_type='zero'; the stem/final reflect pads are unconditional,
# ResNetAutoEncoder.py:26,86 — only the res blocks switch)
# ---------------------------------------------------------------------------

class _TorchZeroResBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv_block = nn.Sequential(
            nn.Conv2d(dim, dim, 3, padding=1, bias=False),
            nn.BatchNorm2d(dim), nn.ReLU(True),
            nn.Conv2d(dim, dim, 3, padding=1, bias=False),
            nn.BatchNorm2d(dim))

    def forward(self, x):
        return x + self.conv_block(x)


def test_reference_ckpt_autodetects_zero_padding_and_disc(tmp_path):
    """File-level auto-detection of the round-5 importer additions: a
    reference epoch_N.tar whose encoder was built with padding_type='zero'
    (no pad layer inside res blocks -> first inner conv at conv_block.0,
    ResNetAutoEncoder.py:128-138) and whose module dict includes the
    PatchGAN discriminator (VPTR_Disc, model/VPTR_modules.py:49-95) must
    convert both, with forward parity."""
    from vptr_tpu.models.autoencoder import ResnetEncoder
    from vptr_tpu.utils.torch_import import import_reference_checkpoint
    import test_torch_parity as ttp

    torch.manual_seed(23)
    RNG = _rng(23)
    tenc = TorchVPTREnc(img_ch=3, feat_dim=DIM, n_res=NRES)
    stem = list(tenc.encoder.model.children())
    for i in [j for j, m in enumerate(stem)
              if isinstance(m, ttp.TorchResnetBlock)]:
        stem[i] = _TorchZeroResBlock(DIM)
    tenc.encoder.model = nn.Sequential(*stem)
    tdisc = TorchVPTRDisc(in_ch=3)
    _randomize_bn(tenc)
    _randomize_bn(tdisc)
    tenc.eval(), tdisc.eval()

    path = tmp_path / "epoch_7.tar"
    torch.save({"epoch": 7, "loss_dict": {},
                "Module_state_dict": {"VPTR_Enc": tenc.state_dict(),
                                      "VPTR_Disc": tdisc.state_dict()},
                "optimizer_state_dict": {}, "code": {}}, str(path))
    converted = import_reference_checkpoint(str(path))
    assert set(converted) == {"VPTR_Enc", "VPTR_Disc"}

    x = _clip(RNG.normal(size=(2, 64, 64, 3)) * 0.4)
    with torch.no_grad():
        want_feat = tenc(torch.tensor(x.transpose(0, 3, 1, 2)))
        want_logits = tdisc(torch.tensor(x.transpose(0, 3, 1, 2)))

    enc_vars = jax.tree_util.tree_map(jnp.asarray, converted["VPTR_Enc"])
    renc = ResnetEncoder(feat_dim=DIM, n_downsampling=3, n_res_blocks=NRES,
                         padding_type="zero")
    got = renc.apply(
        {"params": enc_vars["params"]["encoder"],
         "batch_stats": enc_vars["batch_stats"]["encoder"]},
        jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got),
                               want_feat.numpy().transpose(0, 2, 3, 1),
                               atol=2e-3, rtol=2e-4)

    disc = PatchDiscriminator(ndf=16, n_layers=3, norm="batch")
    disc_vars = jax.tree_util.tree_map(jnp.asarray, converted["VPTR_Disc"])
    got_l = disc.apply(disc_vars, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got_l),
                               want_logits.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-4)


def test_zero_padded_bair_ae_matches_torch():
    torch.manual_seed(17)
    RNG = _rng(17)
    import test_torch_parity as ttp

    tenc = TorchVPTREnc(img_ch=3, feat_dim=DIM, n_res=NRES)
    tdec = TorchVPTRDec(img_ch=3, feat_dim=DIM, out_layer="Tanh")
    # swap the res blocks for zero-padded ones (indices unchanged apart
    # from the missing pad layers — the importer's padding_type handles it)
    stem = list(tenc.encoder.model.children())
    blocks = [i for i, m in enumerate(stem)
              if isinstance(m, ttp.TorchResnetBlock)]
    for i in blocks:
        stem[i] = _TorchZeroResBlock(DIM)
    tenc.encoder.model = nn.Sequential(*stem)
    tenc.eval(), tdec.eval()
    _randomize_bn(tenc)
    _randomize_bn(tdec)

    x = _clip(RNG.normal(size=(2, 2, 64, 64, 3)) * 0.4)
    with torch.no_grad():
        feats = _t_enc(tenc, torch.tensor(x))
        out = _t_dec(tdec, feats)

    enc = VPTREnc(img_channels=3, feat_dim=DIM, n_downsampling=3,
                  n_res_blocks=NRES, padding_type="zero")
    dec = VPTRDec(img_channels=3, n_downsampling=3, out_layer="tanh")
    enc_vars = jax.tree_util.tree_map(
        jnp.asarray, import_vptr_enc(_sd(tenc), n_res_blocks=NRES,
                                     padding_type="zero"))
    dec_vars = jax.tree_util.tree_map(
        jnp.asarray, import_vptr_dec(_sd(tdec)))
    got_f = enc.apply(enc_vars, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got_f), feats.numpy(),
                               atol=2e-3, rtol=2e-4)
    got = dec.apply(dec_vars, got_f, train=False)
    np.testing.assert_allclose(np.asarray(got), out.numpy(),
                               atol=1e-4, rtol=1e-4)
