"""Measure the cost of the reference's 528-wide latent vs MXU-aligned 512.

528 = 8 heads x 66 is the reference's d_model (train_FAR.py:158). TPU lanes
are 128-wide: 528 pads to 640 in the MXU (18% wasted), 512 is exact. This
sweep times the frozen encoder forward and the FAR train step at both widths
to justify the `*_tpu` presets.

    python scripts/latent_width_sweep.py
"""

from __future__ import annotations

import time

import jax
import numpy as np

from vptr_tpu.config import get_preset
from vptr_tpu.train.trainer import Trainer


def timeit(step_fn, state, batch, n=10):
    """Chained state + host fetch: block_until_ready does not synchronize on
    the axon relay platform, only fetching a dependent value does."""
    state, metrics = step_fn(state, *batch)
    float(metrics["T_total"])
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step_fn(state, *batch)
    float(metrics["T_total"])
    return (time.perf_counter() - t0) / n * 1000


def main():
    rng = np.random.default_rng(0)
    past = rng.random((10, 10, 64, 64, 1)).astype(np.float32)
    future = rng.random((10, 10, 64, 64, 1)).astype(np.float32)

    for feat_dim in (528, 512):
        cfg = get_preset("far_mnist").override({
            "ae": {"feat_dim": feat_dim},
            "transformer": {"d_model": feat_dim},
        })
        tr = Trainer(cfg, write_outputs=False)
        state = tr.init_state()
        batch = tr.put_batch(past, future)
        ms = timeit(tr.train_step, state, batch, n=10)
        frames = 10 * 19
        print(f"d={feat_dim}: train step {ms:.2f} ms  "
              f"({frames / ms * 1000:.0f} frames/s)")


if __name__ == "__main__":
    main()
