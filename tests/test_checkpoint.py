"""Checkpoint round-trips: resume, and the stage-1 -> stage-2 AE handoff."""

import pytest
import numpy as np

from vptr_tpu.config import get_preset
from vptr_tpu.train.checkpoint import CheckpointManager, load_ae_modules
from vptr_tpu.train.trainer import Trainer

TINY_AE = {
    "dtype": "float32",
    "loss": {"lam_gan": None},
    "ae": {"feat_dim": 24, "n_res_blocks": 1},
    "data": {"batch_size": 4, "img_size": 32,
             "num_past_frames": 2, "num_future_frames": 2},
}


def _leaves_equal(a, b):
    import jax

    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


@pytest.mark.slow
def test_save_restore_roundtrip(tmp_path):
    cfg = get_preset("ae_mnist").override(TINY_AE)
    tr = Trainer(cfg, write_outputs=False)
    state = tr.init_state()
    rng = np.random.default_rng(0)
    batch = tr.put_batch(rng.random((4, 2, 32, 32, 1)).astype(np.float32),
                         rng.random((4, 2, 32, 32, 1)).astype(np.float32))
    state, _ = tr.train_step(state, *batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state, config_json=cfg.to_json(), history={"epoch": 1})
    restored = mgr.restore(tr.init_state())
    assert _leaves_equal(restored.enc.params, state.enc.params)
    assert _leaves_equal(restored.g_opt, state.g_opt)
    assert mgr.load_history()["epoch"] == 1
    mgr.close()


@pytest.mark.slow
def test_stage1_to_stage2_handoff(tmp_path):
    """Stage 2 must load the frozen stage-1 AE weights
    (reference: train_FAR.py:210)."""
    ae_cfg = get_preset("ae_mnist").override(TINY_AE)
    ae_tr = Trainer(ae_cfg, write_outputs=False)
    ae_state = ae_tr.init_state()
    rng = np.random.default_rng(1)
    batch = ae_tr.put_batch(
        rng.random((4, 2, 32, 32, 1)).astype(np.float32),
        rng.random((4, 2, 32, 32, 1)).astype(np.float32))
    ae_state, _ = ae_tr.train_step(ae_state, *batch)

    ckpt_dir = str(tmp_path / "ae_ckpt")
    mgr = CheckpointManager(ckpt_dir)
    # config.json is required for the cross-stage template rebuild
    mgr.save(1, ae_state, config_json=ae_cfg.to_json())
    mgr.close()

    enc_state, dec_state = load_ae_modules(ckpt_dir)
    assert _leaves_equal(enc_state.params, ae_state.enc.params)

    far_cfg = get_preset("far_mnist").override({
        **TINY_AE,
        "ae_ckpt": ckpt_dir,
        "transformer": {"d_model": 24, "n_heads": 4, "num_encoder_layers": 1,
                        "enc_h": 4, "enc_w": 4, "num_past_frames": 2,
                        "num_future_frames": 2},
        "loss": {"lam_gan": None},
    })
    far_tr = Trainer(far_cfg, write_outputs=False)
    far_state = far_tr.init_state()
    assert _leaves_equal(far_state.enc.params, ae_state.enc.params)
    assert _leaves_equal(far_state.dec.params, ae_state.dec.params)
    # and the loaded AE actually trains stage 2
    far_state, metrics = far_tr.train_step(far_state, *batch)
    assert np.isfinite(float(metrics["T_total"]))

def test_reference_envelope_tolerated(tmp_path):
    """import_reference_checkpoint must survive EVERY key the reference's
    save_ckpt writes (reference: utils/train_summary.py:130-149): epoch,
    loss_dict holding Loss_tuple instances pickled from the reference's OWN
    module namespace (unimportable here), real optimizer state, and the
    ``code`` source-tree byte snapshot."""
    import sys
    import types

    import torch

    from vptr_tpu.utils.torch_import import import_reference_checkpoint

    # Loss_tuple lives in the reference's utils.train_summary; emulate that
    # with a throwaway module that exists at SAVE time only
    mod = types.ModuleType("utils_train_summary_ghost")

    class LossTuple:
        def __init__(self):
            self.train = [0.5, 0.4]
            self.val = [0.6]

    LossTuple.__module__ = mod.__name__
    LossTuple.__qualname__ = "Loss_tuple"
    mod.Loss_tuple = LossTuple
    sys.modules[mod.__name__] = mod

    lin = torch.nn.Linear(4, 4)
    opt = torch.optim.Adam(lin.parameters())
    lin(torch.zeros(1, 4)).sum().backward()
    opt.step()

    path = tmp_path / "epoch_7.tar"
    torch.save({
        "epoch": 7,
        "loss_dict": {"AE_MSE": LossTuple(), "epochs": 7},
        "Module_state_dict": {"VPTR_Disc": lin.state_dict()},
        "optimizer_state_dict": {"optimizer_D": opt.state_dict()},
        "code": {"train_FAR.py": b"#!/usr/bin/env python\nprint('x')\n"},
    }, str(path))
    del sys.modules[mod.__name__]  # make Loss_tuple unresolvable at load

    converted = import_reference_checkpoint(str(path))
    # the disc is an unrecognized module -> skipped; nothing else crashes
    assert converted == {}


@pytest.mark.slow
def test_ckpt_per_epochs_cadence(tmp_path):
    """ckpt_per_epochs=2 over 3 epochs saves at epochs 2 and 3 (the final
    epoch of a train() call always saves), never at epoch 1."""
    cfg = get_preset("ae_mnist").override({
        **TINY_AE, "epochs": 3, "steps_per_epoch": 1, "val_per_epochs": 99,
        "ckpt_per_epochs": 2, "ckpt_dir": str(tmp_path / "run"),
    })
    tr = Trainer(cfg)  # write_outputs=True: ckpt lives behind it
    tr.train()
    mgr = CheckpointManager(str(tmp_path / "run" / "ckpt"))
    steps = sorted(mgr.all_steps())
    assert steps == [2, 3], steps
    assert mgr.load_history()["epoch"] == 3
    mgr.close()
