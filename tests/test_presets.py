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