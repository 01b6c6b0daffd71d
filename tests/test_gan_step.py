"""Discriminator BatchNorm semantics in the GAN steps must match the
reference, where the disc stays in train() mode for ALL per-step forwards
(train_AutoEncoder.py:52-73): running stats update three times per step —
fake pass, then real pass (seeing the fake pass's stats), then the
generator-side pass (with the UPDATED params) — and the generator-side
term normalizes with BATCH stats, not running averages."""

import jax
import jax.numpy as jnp
import numpy as np

from vptr_tpu.config import get_preset
from vptr_tpu.train.trainer import Trainer


def _tiny_gan_cfg():
    return get_preset("ae_mnist").override({
        "dtype": "float32", "steps_per_dispatch": 1,
        "ae": {"feat_dim": 8, "n_res_blocks": 1},
        "data": {"batch_size": 2, "img_size": 32,
                 "num_past_frames": 2, "num_future_frames": 2},
    })


def test_ae_step_disc_stats_update_three_times_sequentially():
    tr = Trainer(_tiny_gan_cfg(), write_outputs=False)
    state = tr.init_state()
    rng = np.random.default_rng(0)
    past = rng.random((2, 2, 32, 32, 1)).astype(np.float32)
    future = rng.random((2, 2, 32, 32, 1)).astype(np.float32)
    batch = tr.put_batch(past, future)

    state2, metrics = tr.raw_train_step(state, *batch)
    assert float(metrics["Dtotal"]) != 0.0

    # recompute the expected stats chain by hand
    disc, enc, dec = tr.disc, tr.enc, tr.dec
    x = jnp.concatenate(batch, axis=1)
    feats, _ = enc.apply(state.enc.variables(), x, train=True,
                         mutable=["batch_stats"] if state.enc.stats else [])
    rec, _ = dec.apply(state.dec.variables(), feats, train=True,
                       mutable=["batch_stats"] if state.dec.stats else [])
    fake = rec.reshape((-1,) + rec.shape[2:])
    real = x.reshape((-1,) + x.shape[2:])

    def bn_pass(params, stats, frames):
        _, aux = disc.apply({"params": params, "batch_stats": stats},
                            frames, train=True, mutable=["batch_stats"])
        return aux["batch_stats"]

    s1 = bn_pass(state.disc.params, state.disc.stats, fake)
    s2 = bn_pass(state.disc.params, s1, real)
    s3 = bn_pass(state2.disc.params, s2, fake)   # gen pass, updated params

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5),
        s3, state2.disc.stats)

    # and the chain is genuinely sequential: skipping the middle pass
    # produces different stats
    s3_wrong = bn_pass(state2.disc.params, s1, fake)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s3_wrong, state2.disc.stats)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0.0
