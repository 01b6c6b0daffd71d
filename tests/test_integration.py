"""End-to-end integration: overfit one batch (SURVEY.md §4's capstone test).

A tiny AE must drive reconstruction MSE down by >5x on a single repeated
batch within a few dozen steps — exercises models, losses, optimizer, GAN
alternation, and batch-stats threading together.
"""

import numpy as np
import pytest

from vptr_tpu.config import get_preset
from vptr_tpu.train.trainer import Trainer

pytestmark = pytest.mark.slow


def test_ae_overfits_one_batch():
    from vptr_tpu.data.datasets import SyntheticMovingMNIST

    cfg = get_preset("ae_mnist").override({
        "dtype": "float32",
        "optim": {"lr": 2e-3},
        "ae": {"feat_dim": 32, "n_res_blocks": 1, "n_downsampling": 2},
        "loss": {"lam_gan": None},          # pure MSE+GDL for determinism
        # 1x1 mesh: replicated 8-device CPU execution made this the slowest
        # test in the suite for no extra coverage (test_parallel owns DP)
        "mesh": {"data": 1, "model": 1},
        "data": {"batch_size": 4, "img_size": 32,
                 "num_past_frames": 2, "num_future_frames": 2},
    })
    tr = Trainer(cfg, write_outputs=False)
    state = tr.init_state()
    # structured (learnable) clips, not noise
    ds = SyntheticMovingMNIST(num_clips=4, num_past=2, num_future=2, size=32)
    clips = [ds.get(i) for i in range(4)]
    past = np.stack([c[0] for c in clips])
    future = np.stack([c[1] for c in clips])
    batch = tr.put_batch(past, future)

    state, first = tr.train_step(state, *batch)
    for _ in range(30):
        state, last = tr.train_step(state, *batch)
    assert float(last["AE_MSE"]) < float(first["AE_MSE"]) / 5.0, (
        f"no overfit: first={float(first['AE_MSE'])} "
        f"last={float(last['AE_MSE'])}")


def test_far_loss_decreases_on_one_batch():
    cfg = get_preset("far_mnist").override({
        "dtype": "float32",
        "ae": {"feat_dim": 24, "n_res_blocks": 1, "n_downsampling": 2},
        "transformer": {"d_model": 24, "n_heads": 4, "num_encoder_layers": 2,
                        "enc_h": 8, "enc_w": 8, "num_past_frames": 2,
                        "num_future_frames": 2, "dropout": 0.0,
                        "drop_path": 0.0},
        "mesh": {"data": 1, "model": 1},
        "data": {"batch_size": 4, "img_size": 32,
                 "num_past_frames": 2, "num_future_frames": 2},
    })
    tr = Trainer(cfg, write_outputs=False)
    state = tr.init_state()
    rng = np.random.default_rng(1)
    past = rng.random((4, 2, 32, 32, 1)).astype(np.float32)
    future = rng.random((4, 2, 32, 32, 1)).astype(np.float32)
    batch = tr.put_batch(past, future)

    state, first = tr.train_step(state, *batch)
    for _ in range(30):
        state, last = tr.train_step(state, *batch)
    assert float(last["T_total"]) < float(first["T_total"])
