"""Every named preset must build a Trainer and run one train step end-to-end
(sizes shrunk for CPU; stage/variant/loss wiring kept)."""

import numpy as np
import pytest

from vptr_tpu.config import get_preset, list_presets
from vptr_tpu.train.trainer import Trainer

SHRINK = {
    "dtype": "float32",
    "ae": {"feat_dim": 24, "n_res_blocks": 1},
    "disc": {"ndf": 8, "n_layers": 2},
    "transformer": {"d_model": 24, "n_heads": 4, "num_encoder_layers": 1,
                    "num_decoder_layers": 1, "enc_h": 4, "enc_w": 4},
    "data": {"batch_size": 2, "img_size": 32},
}


def test_recipe_constants_match_reference():
    """Pin the RECIPE constants the reference's train scripts pass, not the
    class defaults they override — exactly the wiring a per-module parity
    test cannot see.

    * Both NAR scripts build BiPatchNCE(..., 1.0), overriding the 0.07
      class default (reference: train_NAR.py:213, train_NAR_mp.py:128 vs
      criterion.py:211) — every NAR preset must carry temperature 1.0.
    * Every reference BAIR script builds the AE with zero padding
      (reference: train_NAR.py:171,188-189, train_FAR_mp.py:293) — the
      BAIR presets must not ship the reflect default.
    * lam_pc = 0.1 in both NAR scripts (train_NAR.py:174, train_NAR_mp.py:307).
    """
    for name in list_presets():
        cfg = get_preset(name)
        if cfg.stage == "nar":
            assert cfg.loss.nce_temperature == 1.0, name
            assert cfg.loss.lam_nce == 0.1, name
        if cfg.data.dataset == "bair":
            assert cfg.ae.padding_type == "zero", name
        else:
            assert cfg.ae.padding_type == "reflect", name


@pytest.mark.parametrize("name", list_presets())
@pytest.mark.slow
def test_preset_one_step(name):
    cfg = get_preset(name)
    over = dict(SHRINK)
    # keep each preset's frame counts but cap for speed
    tp = min(cfg.data.num_past_frames, 2)
    tf_ = min(cfg.data.num_future_frames, 2)
    over["data"] = {**SHRINK["data"], "num_past_frames": tp,
                    "num_future_frames": tf_}
    over["transformer"] = {**SHRINK["transformer"],
                           "num_past_frames": tp, "num_future_frames": tf_}
    cfg = cfg.override(over)

    tr = Trainer(cfg, write_outputs=False)
    state = tr.init_state()
    rng = np.random.default_rng(0)
    c = cfg.data.img_channels
    past = rng.random((2, tp, 32, 32, c)).astype(np.float32)
    future = rng.random((2, tf_, 32, 32, c)).astype(np.float32)
    state, metrics = tr.train_step(state, *tr.put_batch(past, future))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (name, k, v)
    em, pred = tr.eval_step(state, *tr.put_batch(past, future))
    assert np.isfinite(float(list(em.values())[0]))
    if cfg.stage == "nar" and cfg.loss.lam_nce is not None:
        # the reference computes the NCE term in validation too
        # (train_NAR.py:92-104): val T_total must include lam_pc * T_bpc
        assert "T_bpc" in em, sorted(em)
        assert abs(float(em["T_total"]) - (float(em["T_MSE"])
                   + float(em["T_GDL"])
                   + cfg.loss.lam_nce * float(em["T_bpc"]))) < 1e-4

@pytest.mark.slow
def test_nar_kth_128_geometry_runs():
    """The 128x128 -> 16x16-latent path must actually run: 16 windows per
    frame, 16x16 geometry-bound frame_queries and 2D pos embeds (BASELINE
    config 4 names this geometry literally; no reference script trains it —
    utils/dataset.py:24-25 resizes KTH to 64, see the nar_kth preset note).
    Model widths shrink for CPU; the latent geometry does not."""
    cfg = get_preset("nar_kth_128").override({
        "dtype": "float32",
        "ae": {"feat_dim": 24, "n_res_blocks": 1},
        "transformer": {"d_model": 24, "n_heads": 4, "num_encoder_layers": 1,
                        "num_decoder_layers": 1,
                        "num_past_frames": 2, "num_future_frames": 2},
        "data": {"batch_size": 2, "num_past_frames": 2,
                 "num_future_frames": 2},
    })
    assert cfg.data.img_size == 128
    assert (cfg.transformer.enc_h, cfg.transformer.enc_w) == (16, 16)

    tr = Trainer(cfg, write_outputs=False)
    state = tr.init_state()
    assert state.transformer.params["frame_queries"].shape == (2, 16, 16, 24)
    rng = np.random.default_rng(0)
    past = rng.random((2, 2, 128, 128, 1)).astype(np.float32)
    future = rng.random((2, 2, 128, 128, 1)).astype(np.float32)
    state, metrics = tr.train_step(state, *tr.put_batch(past, future))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    em, pred = tr.eval_step(state, *tr.put_batch(past, future))
    assert pred.shape[-3:] == (128, 128, 1)
    assert np.isfinite(float(list(em.values())[0]))
