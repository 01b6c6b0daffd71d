"""Round-4 TPU sweep: compose the measured-positive micro-wins into one
configuration (VERDICT r3 weak #2) and measure the remaining knobs.

Variants (all far_mnist parity recipe, bf16, steps_per_dispatch auto=8 —
the trainer/bench default, which already reclaims the ~2 ms/step residual
dispatch cost):

  full                 — round-3 default (fully-fused window sublayer,
                         (32,16) kernel tiles, f32 Adam moments): baseline
  full_bigtile         — fused_full_blocks (64,32) (config field now, not
                         the module-global override)
  full_mubf16          — optim.mu_dtype bfloat16 (halves the first-moment
                         HBM traffic of the pure-bandwidth AdamW update —
                         measured 89% of the HBM ceiling in r03's roofline)
  full_bigtile_mubf16  — both composed
  full_bm_k16          — both + steps_per_dispatch 16

Prints one JSON line per variant. Timing fetches a dependent loss value
(block_until_ready does not synchronize on the axon relay). Note the
mu_bf16 rows legitimately diverge in loss after the first optimizer step —
a documented numerics divergence, not a bug (config.py OptimConfig).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

VARIANTS = {
    "full": {},
    "full_bigtile": {"transformer": {"fused_full_blocks": (64, 32)}},
    "full_mubf16": {"optim": {"mu_dtype": "bfloat16"}},
    "full_bigtile_mubf16": {"transformer": {"fused_full_blocks": (64, 32)},
                            "optim": {"mu_dtype": "bfloat16"}},
    "full_bm_k16": {"transformer": {"fused_full_blocks": (64, 32)},
                    "optim": {"mu_dtype": "bfloat16"},
                    "steps_per_dispatch": 16},
}


def run_variant(name: str, overrides: dict, batch: int, steps: int) -> dict:
    import time

    from vptr_tpu.config import get_preset
    from vptr_tpu.train.trainer import Trainer

    cfg = get_preset("far_mnist").override(
        {"dtype": "bfloat16", "data": {"batch_size": batch}, **overrides})
    trainer = Trainer(cfg, write_outputs=False)
    state = trainer.init_state()

    d = cfg.data
    rng = np.random.default_rng(0)
    past = rng.random((batch, d.num_past_frames, d.img_size, d.img_size,
                       d.img_channels), np.float32)
    future = rng.random((batch, d.num_future_frames, d.img_size, d.img_size,
                         d.img_channels), np.float32)

    k = trainer.steps_per_dispatch
    assert k > 1, "sweep expects the scanned-dispatch trainer path"
    bk = trainer.put_batch_stacked(np.stack([past] * k),
                                   np.stack([future] * k))
    dispatches = max(1, steps // k)

    t_compile = time.perf_counter()
    state, metrics = trainer.multi_train_step(state, *bk)
    loss0 = float(metrics["T_total"][0])
    compile_s = time.perf_counter() - t_compile

    t0 = time.perf_counter()
    for _ in range(dispatches):
        state, metrics = trainer.multi_train_step(state, *bk)
    loss = float(metrics["T_total"][-1])
    dt = time.perf_counter() - t0
    n_steps = dispatches * k

    ms = 1e3 * dt / n_steps
    frames = batch * (d.num_past_frames + d.num_future_frames - 1)
    return {"variant": name, "ms_per_step": round(ms, 2),
            "frames_per_sec": round(frames * n_steps / dt, 1),
            "steps_per_dispatch": k,
            "compile_s": round(compile_s, 1),
            "loss_first": round(loss0, 6), "loss_last": round(loss, 6)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variants", nargs="*", default=list(VARIANTS))
    p.add_argument("--batch", type=int, default=10)
    p.add_argument("--steps", type=int, default=48)
    args = p.parse_args()

    for name in args.variants:
        try:
            print(json.dumps(run_variant(name, VARIANTS[name], args.batch,
                                         args.steps)), flush=True)
        except Exception as e:  # keep sweeping past a broken variant
            print(json.dumps({"variant": name, "error": repr(e)[:500]}),
                  flush=True)


if __name__ == "__main__":
    main()
