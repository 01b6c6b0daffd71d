"""CLI surface: presets/info/eval/predict commands end to end (tiny
geometry, 1x1 mesh so the fake cluster doesn't 8x the work)."""

import json

import numpy as np
import pytest

from vptr_tpu.cli import main

TINY_SETS = [
    "--set", "dtype=float32",
    "--set", "mesh.data=1", "--set", "mesh.model=1",
    "--set", "ae.feat_dim=24", "--set", "ae.n_res_blocks=1",
    "--set", "transformer.d_model=24", "--set", "transformer.n_heads=4",
    "--set", "transformer.num_encoder_layers=1",
    "--set", "transformer.num_decoder_layers=1",
    "--set", "transformer.num_past_frames=2",
    "--set", "transformer.num_future_frames=2",
    "--set", "transformer.enc_h=8", "--set", "transformer.enc_w=8",
    "--set", "data.batch_size=2",
    "--set", "data.num_past_frames=2", "--set", "data.num_future_frames=2",
    "--set", "data.test_past_frames=2", "--set", "data.test_future_frames=2",
]


def test_presets_and_info(capsys):
    main(["presets"])
    out = capsys.readouterr().out
    for name in ("ae_mnist", "far_mnist", "nar_mnist", "nar_bair",
                 "far_bair_dp"):
        assert name in out

    main(["info", "--preset", "far_mnist", "--set", "epochs=3"])
    cfg = json.loads(capsys.readouterr().out)
    assert cfg["epochs"] == 3
    assert cfg["transformer"]["d_model"] == 528


def test_info_rejects_unknown_key():
    with pytest.raises(KeyError):
        main(["info", "--preset", "far_mnist", "--set", "no.such_key=1"])


@pytest.mark.slow
def test_eval_command_prints_curves(tmp_path, capsys):
    main(["eval", "--preset", "far_mnist", "--ckpt-dir", str(tmp_path),
          "--mode", "far", "--num-pred", "2", "--max-batches", "1",
          *TINY_SETS])
    out = json.loads(capsys.readouterr().out)
    for metric in ("psnr", "ssim", "mse"):
        assert len(out[metric]) == 2
        assert np.isfinite(out[metric]).all()
    assert "mean" in out


def test_predict_command_writes_artifacts(tmp_path, capsys):
    out_dir = tmp_path / "preds"
    main(["predict", "--preset", "far_mnist",
          "--ckpt-dir", str(tmp_path / "ck"), "--mode", "far",
          "--num-pred", "2", "--batches", "1", "--out", str(out_dir),
          *TINY_SETS])
    files = list(out_dir.rglob("*"))
    assert any(f.suffix == ".avi" for f in files), files
    assert any(f.suffix == ".gif" for f in files), files
