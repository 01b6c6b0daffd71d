"""Separate device compute from host dispatch overhead on the relay TPU.

Times the FAR train step two ways:
  (a) one jit call per step (the trainer's loop),
  (b) K steps folded into one jitted lax.scan (single dispatch).
If (b) is much faster per step, per-call relay overhead dominates and the
trainer/bench should batch steps per dispatch.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/dispatch_overhead_probe.py
"""

from __future__ import annotations

import time

import jax
import numpy as np

from vptr_tpu.config import get_preset
from vptr_tpu.train.trainer import Trainer


def main():
    cfg = get_preset("far_mnist")
    tr = Trainer(cfg, write_outputs=False)
    state = tr.init_state()
    rng = np.random.default_rng(0)
    past = rng.random((10, 10, 64, 64, 1)).astype(np.float32)
    future = rng.random((10, 10, 64, 64, 1)).astype(np.float32)
    batch = tr.put_batch(past, future)

    # (a) per-step dispatch
    state, metrics = tr.train_step(state, *batch)
    float(metrics["T_total"])
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = tr.train_step(state, *batch)
    float(metrics["T_total"])
    per_step_a = (time.perf_counter() - t0) / n * 1000
    print(f"(a) per-step dispatch: {per_step_a:.1f} ms/step")

    # (b) K steps per dispatch via lax.scan
    k = 10
    raw_step = tr.raw_train_step  # un-jitted step fn

    @jax.jit
    def multi_step(state, past, future):
        def body(s, _):
            s, m = raw_step(s, past, future)
            return s, m["T_total"]
        state, losses = jax.lax.scan(body, state, None, length=k)
        return state, losses[-1]

    state2, last = multi_step(state, *batch)
    float(last)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        state2, last = multi_step(state2, *batch)
    float(last)
    per_step_b = (time.perf_counter() - t0) / (reps * k) * 1000
    print(f"(b) {k}-step scan dispatch: {per_step_b:.1f} ms/step")
    print(f"dispatch overhead ~= {per_step_a - per_step_b:.1f} ms/call")


if __name__ == "__main__":
    main()
