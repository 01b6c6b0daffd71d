"""Criterion parity tests — torch computations inline as the oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from vptr_tpu.losses import (
    bi_patch_nce,
    gan_loss,
    gdl_loss,
    l1_loss,
    mse_loss,
    noam_schedule,
    temporal_weight,
)

RNG = np.random.default_rng(5)


def test_temporal_weight_values():
    """w[t] = exp(log(T)/(T-1) * t): w[0]=1, w[T-1]=T
    (reference: criterion.py:8-13)."""
    w = np.asarray(temporal_weight(5))
    assert abs(w[0] - 1.0) < 1e-6
    assert abs(w[-1] - 5.0) < 1e-5


def test_mse_l1_with_weights_and_norm():
    gt = RNG.normal(size=(2, 4, 3, 5, 5)).astype(np.float32)
    pred = RNG.normal(size=(2, 4, 3, 5, 5)).astype(np.float32)
    w = np.asarray(temporal_weight(4))

    tg, tp = torch.tensor(gt), torch.tensor(pred)
    ref_mse = (torch.square(tp - tg) *
               torch.tensor(w)[None, :, None, None, None]).mean().item()
    got = float(mse_loss(jnp.asarray(gt), jnp.asarray(pred),
                         weights=jnp.asarray(w)))
    assert abs(got - ref_mse) < 1e-5

    # L2-normalized along channel axis (BiPatchNCE pre-processing path,
    # reference: train_NAR.py:33-47 norm_dim usage)
    ref_l1 = torch.abs(F.normalize(tp, p=2, dim=2) -
                       F.normalize(tg, p=2, dim=2)).mean().item()
    got_l1 = float(l1_loss(jnp.asarray(gt), jnp.asarray(pred), norm_axis=2))
    assert abs(got_l1 - ref_l1) < 1e-5


def test_gdl_matches_torch_reference_computation():
    """Independent torch computation of the gradient-difference loss
    (reference: criterion.py:134-204). NHWC here vs NCHW there."""
    gt = RNG.normal(size=(2, 3, 6, 7, 2)).astype(np.float32)   # NTHWC
    pred = RNG.normal(size=(2, 3, 6, 7, 2)).astype(np.float32)

    tg = torch.tensor(gt.transpose(0, 1, 4, 2, 3)).flatten(0, 1)  # (NT,C,H,W)
    tp = torch.tensor(pred.transpose(0, 1, 4, 2, 3)).flatten(0, 1)
    gdl1 = torch.abs(torch.abs(tg[:, :, 1:] - tg[:, :, :-1]) -
                     torch.abs(tp[:, :, 1:] - tp[:, :, :-1])).mean()
    gdl2 = torch.abs(torch.abs(tg[:, :, :, 1:] - tg[:, :, :, :-1]) -
                     torch.abs(tp[:, :, :, 1:] - tp[:, :, :, :-1])).mean()
    ref = (gdl1 + gdl2).item()
    got = float(gdl_loss(jnp.asarray(gt), jnp.asarray(pred)))
    assert abs(got - ref) < 1e-6


def test_gan_loss_modes():
    logits = RNG.normal(size=(4, 6, 6, 1)).astype(np.float32)
    t = torch.tensor(logits)
    ref_v = F.binary_cross_entropy_with_logits(t, torch.ones_like(t)).item()
    got_v = float(gan_loss(jnp.asarray(logits), True, "vanilla"))
    assert abs(got_v - ref_v) < 1e-6
    ref_ls = torch.square(t - 0.0).mean().item()
    got_ls = float(gan_loss(jnp.asarray(logits), False, "lsgan"))
    assert abs(got_ls - ref_ls) < 1e-6
    assert abs(float(gan_loss(jnp.asarray(logits), True, "wgangp")) +
               logits.mean()) < 1e-6


def test_bi_patch_nce_matches_torch_reference_computation():
    """Oracle: the reference's two-matmul + CE construction
    (reference: criterion.py:227-259), re-done in torch."""
    n, t, h, w, c = 2, 2, 3, 3, 4
    gt = RNG.normal(size=(n, t, h, w, c)).astype(np.float32)
    pred = RNG.normal(size=(n, t, h, w, c)).astype(np.float32)
    temp = 0.07

    tg = torch.tensor(gt).reshape(n * t, h * w, c)
    tp = torch.tensor(pred).reshape(n * t, h * w, c)
    mask = torch.eye(h * w).unsqueeze(0).repeat(n * t, 1, 1)
    s1 = (torch.matmul(tg, tp.transpose(1, 2)) * mask +
          torch.matmul(tg, tp.transpose(1, 2)) * (1 - mask)) / temp
    s2 = (torch.matmul(tp, tg.transpose(1, 2)) * mask +
          torch.matmul(tp, tg.transpose(1, 2)) * (1 - mask)) / temp
    target = torch.argmax(mask.flatten(0, 1), dim=1)
    ref = 0.5 * (F.cross_entropy(s1.flatten(0, 1), target) +
                 F.cross_entropy(s2.flatten(0, 1), target))
    got = float(bi_patch_nce(jnp.asarray(gt), jnp.asarray(pred), temp))
    assert abs(got - ref.item()) < 1e-5


def test_bi_patch_nce_stops_gradient_on_negatives():
    """Gradient w.r.t. pred through the *negative* pairs must vanish —
    mirror of the reference's .detach() (criterion.py:239,245).

    Check: with orthogonal one-hot patches, gradient of direction-1 loss wrt
    pred equals gradient computed with negatives fully detached."""
    n, t, h, w, c = 1, 1, 2, 2, 3
    gt = RNG.normal(size=(n, t, h, w, c)).astype(np.float32)
    pred = RNG.normal(size=(n, t, h, w, c)).astype(np.float32)

    def loss_fn(p):
        return bi_patch_nce(jnp.asarray(gt), p)

    g = jax.grad(loss_fn)(jnp.asarray(pred))
    assert np.isfinite(np.asarray(g)).all()
    # torch oracle with detach semantics
    tp = torch.tensor(pred.reshape(1, h * w, c), requires_grad=True)
    tg = torch.tensor(gt.reshape(1, h * w, c))
    mask = torch.eye(h * w).unsqueeze(0)
    s1 = (torch.matmul(tg, tp.transpose(1, 2)) * mask +
          torch.matmul(tg, tp.detach().transpose(1, 2)) * (1 - mask)) / 0.07
    s2 = (torch.matmul(tp, tg.transpose(1, 2)) * mask +
          torch.matmul(tp, tg.detach().transpose(1, 2)) * (1 - mask)) / 0.07
    target = torch.argmax(mask.flatten(0, 1), dim=1)
    ref = 0.5 * (F.cross_entropy(s1.flatten(0, 1), target) +
                 F.cross_entropy(s2.flatten(0, 1), target))
    ref.backward()
    np.testing.assert_allclose(np.asarray(g).reshape(1, h * w, c),
                               tp.grad.numpy(), atol=1e-5, rtol=1e-4)


def test_bi_patch_nce_reference_recipe_temperature_one():
    """The RECIPE constant, not the class default: both reference NAR train
    scripts construct BiPatchNCE(N, Tf, encH, encW, 1.0)
    (reference: train_NAR.py:213, train_NAR_mp.py:128), overriding
    criterion.py:211's 0.07. Oracle re-derives the full recipe chain —
    F.normalize(dim=channel) on both feature sets (train_NAR.py:36) then the
    bidirectional masked-matmul CE at temperature 1.0 with negatives
    detached (criterion.py:227-259) — and checks value AND gradient."""
    from vptr_tpu.losses import l2_normalize_channels

    n, t, h, w, c = 2, 3, 4, 4, 6
    gt = RNG.normal(size=(n, t, h, w, c)).astype(np.float32)
    pred = RNG.normal(size=(n, t, h, w, c)).astype(np.float32)
    temp = 1.0

    def loss_fn(p):
        return bi_patch_nce(l2_normalize_channels(jnp.asarray(gt)),
                            l2_normalize_channels(p), temp)

    got, g = jax.value_and_grad(loss_fn)(jnp.asarray(pred))

    tp_raw = torch.tensor(pred, requires_grad=True)
    tg = F.normalize(torch.tensor(gt), p=2, dim=-1).reshape(n * t, h * w, c)
    tp = F.normalize(tp_raw, p=2, dim=-1).reshape(n * t, h * w, c)
    mask = torch.eye(h * w).unsqueeze(0).repeat(n * t, 1, 1)
    s1 = (torch.matmul(tg, tp.transpose(1, 2)) * mask +
          torch.matmul(tg, tp.detach().transpose(1, 2)) * (1 - mask)) / temp
    s2 = (torch.matmul(tp, tg.transpose(1, 2)) * mask +
          torch.matmul(tp, tg.detach().transpose(1, 2)) * (1 - mask)) / temp
    target = torch.argmax(mask.flatten(0, 1), dim=1)
    ref = 0.5 * (F.cross_entropy(s1.flatten(0, 1), target) +
                 F.cross_entropy(s2.flatten(0, 1), target))
    ref.backward()
    assert abs(float(got) - ref.item()) < 1e-5
    np.testing.assert_allclose(np.asarray(g), tp_raw.grad.numpy(),
                               atol=1e-5, rtol=1e-4)


def test_noam_schedule_shape():
    sched = noam_schedule(512, factor=2.0, warmup_steps=100)
    lrs = [float(sched(s)) for s in [1, 50, 100, 200, 1000]]
    assert lrs[2] == max(lrs)  # peak at warmup
    assert lrs[0] < lrs[1] < lrs[2] and lrs[3] > lrs[4]


def test_build_optimizer_mu_dtype():
    """optim.mu_dtype="bfloat16" stores Adam's first moment in bf16 (the
    update phase is pure HBM bandwidth — BENCH_NOTES r4) and still trains;
    f32 default is reference parity."""
    import optax

    from vptr_tpu.config import OptimConfig
    from vptr_tpu.losses import build_optimizer

    params = {"w": jnp.ones((4, 4), jnp.float32)}
    grads = {"w": jnp.full((4, 4), 0.5, jnp.float32)}
    for dt, expect in [("float32", jnp.float32), ("bfloat16", jnp.bfloat16)]:
        opt = build_optimizer(OptimConfig(mu_dtype=dt))
        state = opt.init(params)
        mu = jax.tree_util.tree_leaves(
            [s.mu for s in jax.tree_util.tree_leaves(
                state, is_leaf=lambda x: hasattr(x, "mu")) if hasattr(s, "mu")])
        assert all(m.dtype == expect for m in mu), (dt, mu)
        updates, _ = opt.update(grads, state, params)
        new = optax.apply_updates(params, updates)
        assert np.isfinite(np.asarray(new["w"])).all()
