"""Separate device compute from host dispatch overhead on the relay TPU.

Times the FAR train step four ways (round-3 measurements, fused-full
default, batch 10):

  (a)  one jit call per step (the trainer's K=1 loop)        162.1 ms/step
  (b)  lax.scan over K steps, batch CAPTURED (xs=None)       152.2 ms/step
  (c)  lax.scan over K stacked batches (trainer K>1 path)    160.0 ms/step
  (b2) like (b) but a loop-varying epsilon added to the
       batch inside the body to defeat hoisting              160.3 ms/step

Interpretation — (b) is a TRAP, not a dispatch win: with the batch
loop-invariant, XLA's loop-invariant code motion hoists the frozen
conv-encode (a pure function of AE params + batch, ~10 ms at this shape)
out of the scan, so (b) measures 9 encodes fewer than honest training.
(b2) re-pins the encode in-loop and lands exactly on (c). The true
per-call relay dispatch overhead inside a hot training loop is therefore
(a) - (c) ~= 2 ms/step — async dispatch pipelines under the ~160 ms of
device work; the ~11 ms/call figure earlier rounds measured on small
standalone programs does not apply when the device queue stays full.
The trainer's steps_per_dispatch=8 default keeps the ~2 ms win.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/dispatch_overhead_probe.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from vptr_tpu.config import get_preset
from vptr_tpu.train.trainer import Trainer


def main():
    cfg = get_preset("far_mnist").override({"steps_per_dispatch": 1})
    tr = Trainer(cfg, write_outputs=False)
    state = tr.init_state()
    rng = np.random.default_rng(0)
    past = rng.random((10, 10, 64, 64, 1)).astype(np.float32)
    future = rng.random((10, 10, 64, 64, 1)).astype(np.float32)
    batch = tr.put_batch(past, future)
    raw_step = tr.raw_train_step  # un-jitted step fn
    k = 10

    # (a) per-step dispatch
    state, metrics = tr.train_step(state, *batch)
    float(metrics["T_total"])
    t0 = time.perf_counter()
    for _ in range(k):
        state, metrics = tr.train_step(state, *batch)
    float(metrics["T_total"])
    print(f"(a) per-step: {(time.perf_counter()-t0)/k*1000:.1f} ms/step",
          flush=True)

    # (b) scan, captured loop-invariant batch — LICM hoists the frozen
    # encode out of the loop; an invalid shortcut kept as the control
    @jax.jit
    def multi_b(state, past, future):
        def body(s, _):
            s, mm = raw_step(s, past, future)
            return s, mm["T_total"]
        state, losses = jax.lax.scan(body, state, None, length=k)
        return state, losses[-1]

    state, last = multi_b(state, *batch)
    float(last)
    t0 = time.perf_counter()
    for _ in range(3):
        state, last = multi_b(state, *batch)
    float(last)
    print(f"(b) scan captured (encode hoisted): "
          f"{(time.perf_counter()-t0)/(3*k)*1000:.1f} ms/step", flush=True)

    # (c) scan over stacked xs — the trainer's steps_per_dispatch path
    past_k = np.stack([past] * k)
    future_k = np.stack([future] * k)
    bk = tr.put_batch_stacked(past_k, future_k)

    @jax.jit
    def multi_c(state, pk, fk):
        def body(s, b):
            s, mm = raw_step(s, *b)
            return s, mm["T_total"]
        state, losses = jax.lax.scan(body, state, (pk, fk))
        return state, losses[-1]

    state, last = multi_c(state, *bk)
    float(last)
    t0 = time.perf_counter()
    for _ in range(3):
        state, last = multi_c(state, *bk)
    float(last)
    print(f"(c) scan stacked xs (trainer path): "
          f"{(time.perf_counter()-t0)/(3*k)*1000:.1f} ms/step", flush=True)

    # (b2) captured batch + loop-varying epsilon: defeats hoisting, keeps
    # the single-buffer layout — isolates LICM as (b)'s only advantage
    @jax.jit
    def multi_b2(state, past, future):
        def body(s, i):
            eps = (jnp.float32(i) * 1e-30).astype(past.dtype)
            s, mm = raw_step(s, past + eps, future + eps)
            return s, mm["T_total"]
        state, losses = jax.lax.scan(body, state, jnp.arange(k))
        return state, losses[-1]

    state, last = multi_b2(state, *batch)
    float(last)
    t0 = time.perf_counter()
    for _ in range(3):
        state, last = multi_b2(state, *batch)
    float(last)
    print(f"(b2) scan captured, hoist-defeated: "
          f"{(time.perf_counter()-t0)/(3*k)*1000:.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
