"""Autoencoder geometry/parity tests (torch used as oracle only)."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np
import torch
import torch.nn as nn

from vptr_tpu.models.autoencoder import (
    TorchConvTranspose,
    VPTRDec,
    VPTREnc,
)

RNG = np.random.default_rng(7)


def test_conv_transpose_matches_torch():
    """Exact torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1) geometry
    (the decoder upsample, reference: ResNetAutoEncoder.py:74-88)."""
    tm = nn.ConvTranspose2d(5, 7, 3, stride=2, padding=1, output_padding=1,
                            bias=True)
    x = RNG.normal(size=(2, 5, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()

    mod = TorchConvTranspose(7, 3, 2, 1, 1, use_bias=True)
    w = tm.weight.detach().numpy()          # (in, out, kh, kw)
    kernel = w.transpose(2, 3, 0, 1)        # (kh, kw, in, out)
    params = {"kernel": jnp.asarray(kernel),
              "bias": jnp.asarray(tm.bias.detach().numpy())}
    out = mod.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_encoder_decoder_geometry():
    """64x64 frames -> 8x8 latents -> 64x64 frames with n_downsampling=3
    (reference: train_FAR.py:158, ResNetAutoEncoder.py:31-41)."""
    enc = VPTREnc(img_channels=1, feat_dim=48, n_downsampling=3)
    dec = VPTRDec(img_channels=1, n_downsampling=3, out_layer="sigmoid")
    x = jnp.asarray(RNG.normal(size=(2, 3, 64, 64, 1)).astype(np.float32))
    ev = enc.init(jax.random.PRNGKey(0), x)
    feat = enc.apply(ev, x)
    assert feat.shape == (2, 3, 8, 8, 48)
    assert np.asarray(feat).min() >= 0.0  # final ReLU
    dv = dec.init(jax.random.PRNGKey(1), feat)
    out = dec.apply(dv, feat)
    assert out.shape == x.shape
    o = np.asarray(out)
    assert o.min() >= 0.0 and o.max() <= 1.0  # sigmoid head


def test_batchnorm_state_updates():
    enc = VPTREnc(img_channels=1, feat_dim=32, n_downsampling=2, norm="batch")
    x = jnp.asarray(RNG.normal(size=(1, 2, 16, 16, 1)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x, train=True)
    assert "batch_stats" in variables
    _, updated = enc.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updated["batch_stats"])
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0
               for a, b in zip(after, before))


def test_group_norm_variant_has_no_state():
    enc = VPTREnc(img_channels=1, feat_dim=32, n_downsampling=2, norm="group")
    x = jnp.asarray(RNG.normal(size=(1, 2, 16, 16, 1)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x, train=True)
    assert "batch_stats" not in variables


def test_ae_config_knobs_are_wired():
    """ngf / n_res_blocks / use_dropout must actually change the built
    model (they were once accepted by the config but silently dropped
    by build_autoencoder)."""
    import jax
    import jax.numpy as jnp
    from vptr_tpu.config import AutoencoderConfig
    from vptr_tpu.models.autoencoder import build_autoencoder

    x = jnp.zeros((1, 2, 32, 32, 1), jnp.float32)
    rng = jax.random.PRNGKey(0)

    def n_params(cfg):
        enc, _ = build_autoencoder(cfg)
        v = enc.init(rng, x, train=False)
        return sum(p.size for p in jax.tree_util.tree_leaves(v["params"]))

    base = AutoencoderConfig(feat_dim=24)
    assert n_params(AutoencoderConfig(feat_dim=24, ngf=32)) < n_params(base)
    assert (n_params(AutoencoderConfig(feat_dim=24, n_res_blocks=2))
            < n_params(base))

    # dropout is live in train mode: needs the rng and perturbs the output
    enc, _ = build_autoencoder(AutoencoderConfig(feat_dim=24,
                                                 use_dropout=True))
    v = enc.init({"params": rng, "dropout": rng}, x, train=False)
    xr = jax.random.uniform(rng, x.shape)
    a = enc.apply(v, xr, train=True, mutable=["batch_stats"],
                  rngs={"dropout": jax.random.PRNGKey(1)})[0]
    b = enc.apply(v, xr, train=True, mutable=["batch_stats"],
                  rngs={"dropout": jax.random.PRNGKey(2)})[0]
    assert float(jnp.abs(a - b).max()) > 0.0
