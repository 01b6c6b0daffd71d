"""Multi-step dispatch (steps_per_dispatch): K train steps folded into one
jitted lax.scan must match K sequential single-step dispatches — same final
parameters, same per-step losses. The fold exists to amortize the remote
relay's residual per-jit-call host overhead — measured ~2 ms/step in a hot
loop (scripts/dispatch_overhead_probe);
it must be a pure batching of the step function, not a semantic change.
"""

import jax
import numpy as np

from vptr_tpu.config import get_preset
from vptr_tpu.train.trainer import Trainer, _expand_metrics


def _tiny_cfg(k):
    return get_preset("far_mnist").override({
        "dtype": "float32",
        "steps_per_dispatch": k,
        "ae": {"feat_dim": 24, "n_res_blocks": 1, "n_downsampling": 2},
        "transformer": {"d_model": 24, "n_heads": 4, "num_encoder_layers": 2,
                        "enc_h": 8, "enc_w": 8, "num_past_frames": 2,
                        "num_future_frames": 2, "dropout": 0.0,
                        "drop_path": 0.0},
        "mesh": {"data": 2, "model": 1},
        "data": {"batch_size": 4, "img_size": 32,
                 "num_past_frames": 2, "num_future_frames": 2},
    })


def test_multi_step_dispatch_matches_sequential():
    k = 3
    rng = np.random.default_rng(0)
    past_k = rng.random((k, 4, 2, 32, 32, 1)).astype(np.float32)
    future_k = rng.random((k, 4, 2, 32, 32, 1)).astype(np.float32)

    tr = Trainer(_tiny_cfg(k), write_outputs=False)
    assert tr.steps_per_dispatch == k and tr.multi_train_step is not None

    # sequential single-step dispatches
    state = tr.init_state()
    seq_metrics = []
    for i in range(k):
        state, m = tr.train_step(state, *tr.put_batch(past_k[i], future_k[i]))
        seq_metrics.append(jax.device_get(m))
    seq_params = jax.device_get(state.transformer.params)

    # one scanned dispatch over the same batches from the same init
    state2 = tr.init_state()
    state2, ms = tr.multi_train_step(
        state2, *tr.put_batch_stacked(past_k, future_k))
    scan_metrics = _expand_metrics([(True, jax.device_get(ms))])
    scan_params = jax.device_get(state2.transformer.params)

    assert len(scan_metrics) == k
    for i, (a, b) in enumerate(zip(seq_metrics, scan_metrics)):
        assert set(a) == set(b)
        for key in a:
            np.testing.assert_allclose(a[key], b[key], atol=1e-5, rtol=1e-4,
                                       err_msg=f"step {i} metric {key}")
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4),
        seq_params, scan_params)
    assert int(jax.device_get(state2.step)) == k


def test_trainer_fit_with_dispatch_groups_and_tail():
    """trainer.train() with steps_per_epoch not divisible by K: full groups
    go through the scan path, the tail through single steps; metric
    accounting sees every step exactly once."""
    cfg = _tiny_cfg(2).override({"epochs": 1, "steps_per_epoch": 5,
                                 "val_per_epochs": 100,
                                 "data": {"dataset": "synthetic"}})
    tr = Trainer(cfg, write_outputs=False)
    state = tr.train(epochs=1)
    assert int(jax.device_get(state.step)) == 5
    hist = tr.history["train"]
    # 5 steps counted in the epoch throughput line
    assert hist["steps_per_sec"][0][0] == 1


def test_expand_metrics_passthrough_and_stacked():
    scalars = {"a": np.float32(1.0)}
    stacked = {"a": np.arange(3, dtype=np.float32)}
    out = _expand_metrics([(False, scalars), (True, stacked)])
    assert len(out) == 4
    assert out[0]["a"] == 1.0
    assert [m["a"] for m in out[1:]] == [0.0, 1.0, 2.0]
    # the tag is authoritative: a 1-D metric in single-step mode must NOT
    # be exploded into bogus per-step dicts
    vec = {"per_t": np.arange(5, dtype=np.float32)}
    assert _expand_metrics([(False, vec)]) == [vec]
