"""Eval harness + LPIPS module + CLI plumbing."""

import json

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from vptr_tpu.config import get_preset
from vptr_tpu.data.loader import build_loader
from vptr_tpu.eval.harness import evaluate
from vptr_tpu.eval.lpips import LPIPS, lpips_available, make_lpips_fn
from vptr_tpu.train.trainer import Trainer

TINY = {
    "dtype": "float32",
    "ae": {"feat_dim": 24, "n_res_blocks": 1},
    "transformer": {"d_model": 24, "n_heads": 4, "num_encoder_layers": 1,
                    "num_decoder_layers": 1, "num_past_frames": 2,
                    "num_future_frames": 2, "enc_h": 4, "enc_w": 4,
                    "dropout": 0.0, "drop_path": 0.0},
    "data": {"batch_size": 4, "img_size": 32, "num_past_frames": 2,
             "num_future_frames": 2, "test_past_frames": 2,
             "test_future_frames": 2},
}


@pytest.mark.slow
def test_harness_all_rollout_modes():
    for stage, modes in [("far", ["far", "far_rip", "far_ril"]),
                         ("nar", ["nar"])]:
        cfg = get_preset(f"{stage}_mnist").override(TINY)
        trainer = Trainer(cfg, write_outputs=False)
        state = trainer.init_state()
        loader = build_loader(cfg.data, split="test")
        for mode in modes:
            curves = evaluate(trainer, state, loader, mode=mode,
                              num_pred=2, max_batches=1)
            assert set(curves) == {"psnr", "ssim", "mse"}
            for m, c in curves.items():
                assert c.shape == (2,)
                assert np.isfinite(c).all(), (mode, m, c)


def test_lpips_module_properties():
    """Identical inputs -> 0; different inputs -> > 0 (any weights)."""
    model = LPIPS()
    x = jnp.asarray(np.random.default_rng(0).uniform(
        size=(2, 32, 32, 1)).astype(np.float32))
    y = jnp.asarray(np.random.default_rng(1).uniform(
        size=(2, 32, 32, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, x)
    same = model.apply(params, x, x)
    diff = model.apply(params, x, y)
    np.testing.assert_allclose(np.asarray(same), 0.0, atol=1e-5)
    assert np.asarray(diff).min() > 0

    if not lpips_available():
        assert make_lpips_fn() is None


def test_cli_presets_and_info(capsys):
    from vptr_tpu.cli import main

    main(["presets"])
    out = capsys.readouterr().out
    assert "far_mnist" in out and "nar_kth" in out

    main(["info", "--preset", "far_mnist", "--set", "epochs=3",
          "--set", "optim.lr=0.002"])
    cfg = json.loads(capsys.readouterr().out)
    assert cfg["epochs"] == 3
    assert cfg["optim"]["lr"] == 0.002
    assert cfg["transformer"]["num_encoder_layers"] == 12
