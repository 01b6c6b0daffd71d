"""Rollout correctness: scan ring-buffer == naive python-loop reference."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from vptr_tpu.eval.rollout import (
    far_rollout_latent,
    far_rollout_pixel,
    nar_rollout,
)
from vptr_tpu.models.transformer import VPTRFormerFAR, VPTRFormerNAR

RNG = np.random.default_rng(9)

H = W = 8
C = 12


def _identity_codec():
    """Trivial enc/dec on 8x8 'frames' == latents, isolating rollout logic."""
    enc = lambda frames: frames
    dec = lambda feats: feats
    return enc, dec


def _make_far(tp, tf):
    model = VPTRFormerFAR(num_past_frames=tp, num_future_frames=tf,
                          enc_h=H, enc_w=W, d_model=C, num_heads=4,
                          num_encoder_layers=1, window=4, dropout=0.0,
                          drop_path=0.0, ffn_hidden_ratio=2)
    x = jnp.zeros((1, tp, H, W, C))
    variables = model.init(jax.random.PRNGKey(0), x)
    return lambda feats: model.apply(variables, feats, train=False)


def _naive_far_rollout(tr_fn, enc, dec, past, num_pred, context):
    """Python-loop re-derivation of the reference's growing-context +
    sliding-window rollout (Test_VPTR.ipynb FAR_RIP)."""
    feats = enc(past)
    preds = []
    for _ in range(num_pred):
        out = tr_fn(feats)                   # causal; last valid position
        last = out[:, -1:]
        frame = dec(last)
        preds.append(np.asarray(frame[:, 0]))
        feats = jnp.concatenate([feats, enc(frame)], axis=1)
        if feats.shape[1] > context:
            feats = feats[:, 1:]
    return np.stack(preds, axis=1)


@pytest.mark.slow
def test_far_rollout_matches_naive_loop():
    tp, tf, num_pred = 3, 3, 5             # crosses the buffer-full boundary
    tr_fn = _make_far(tp, tf)
    enc, dec = _identity_codec()
    past = jnp.asarray(RNG.normal(size=(2, tp, H, W, C)).astype(np.float32))

    got = np.asarray(far_rollout_pixel(enc, dec, tr_fn, past, num_pred,
                                       context=tp + tf))
    want = _naive_far_rollout(tr_fn, enc, dec, past, num_pred,
                              context=tp + tf)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_far_latent_equals_pixel_with_identity_codec():
    tp, tf = 2, 2
    tr_fn = _make_far(tp, tf)
    enc, dec = _identity_codec()
    past = jnp.asarray(RNG.normal(size=(1, tp, H, W, C)).astype(np.float32))
    rip = far_rollout_pixel(enc, dec, tr_fn, past, 3, context=tp + tf)
    ril = far_rollout_latent(enc, dec, tr_fn, past, 3, context=tp + tf)
    np.testing.assert_allclose(np.asarray(rip), np.asarray(ril),
                               atol=1e-5, rtol=1e-5)


def test_nar_rollout_chaining():
    tp, tf = 3, 3
    model = VPTRFormerNAR(num_past_frames=tp, num_future_frames=tf,
                          enc_h=H, enc_w=W, d_model=C, num_heads=4,
                          num_encoder_layers=1, num_decoder_layers=1,
                          window=4, dropout=0.0, drop_path=0.0,
                          ffn_hidden_ratio=2, rpe=False)
    x = jnp.zeros((1, tp, H, W, C))
    variables = model.init(jax.random.PRNGKey(0), x, train=False,
                           method="init_all")
    tr_fn = lambda feats: model.apply(variables, feats, train=False)
    enc, dec = _identity_codec()
    past = jnp.asarray(RNG.normal(size=(2, tp, H, W, C)).astype(np.float32))

    # single block
    one = np.asarray(nar_rollout(enc, dec, tr_fn, past, tf, tf))
    direct = np.asarray(tr_fn(past))
    np.testing.assert_allclose(one, direct, atol=1e-5)

    # chained: 7 = 3 + 3 + 1 -> python-loop reference
    got = np.asarray(nar_rollout(enc, dec, tr_fn, past, 7, tf))
    ctx = past
    chunks = []
    for _ in range(3):
        pred = tr_fn(ctx)
        chunks.append(np.asarray(pred))
        ctx = jnp.concatenate([ctx, pred], axis=1)[:, -tp:]
    want = np.concatenate(chunks, axis=1)[:, :7]
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_nar_rollout_chaining_tp_neq_tf():
    """The BAIR 2->28 shape in miniature: Tp=2 != Tf=4, num_pred=10 chains
    4+4+2 with a partial last block; each next context is the LAST Tp frames
    of (context + prediction) — the notebook's NAR_BAIR_2_to_28 semantics."""
    tp, tf, num_pred = 2, 4, 10
    model = VPTRFormerNAR(num_past_frames=tp, num_future_frames=tf,
                          enc_h=H, enc_w=W, d_model=C, num_heads=4,
                          num_encoder_layers=1, num_decoder_layers=1,
                          window=4, dropout=0.0, drop_path=0.0,
                          ffn_hidden_ratio=2, rpe=True)
    x = jnp.zeros((1, tp, H, W, C))
    variables = model.init(jax.random.PRNGKey(0), x, train=False,
                           method="init_all")
    tr_fn = lambda feats: model.apply(variables, feats, train=False)
    enc, dec = _identity_codec()
    past = jnp.asarray(RNG.normal(size=(2, tp, H, W, C)).astype(np.float32))

    got = np.asarray(nar_rollout(enc, dec, tr_fn, past, num_pred, tf))
    ctx = enc(past)
    chunks = []
    for _ in range(3):
        pred = tr_fn(ctx)
        chunks.append(np.asarray(pred))
        ctx = jnp.concatenate([ctx, pred], axis=1)[:, -tp:]
    want = np.concatenate(chunks, axis=1)[:, :num_pred]
    assert got.shape == (2, num_pred, H, W, C)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
