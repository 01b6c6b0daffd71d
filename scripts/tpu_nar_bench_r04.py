"""Round-4 NAR chip measurements:

  1. nar_mnist re-measure under the composed round-4 defaults (bigtile +
     mu-bf16 + the now-rectangular-capable core kernel) — VERDICT r3 ask #2.
  2. nar_bair (the published headline geometry, Tp=2 -> Tf=10, 3-channel):
     the first bench row at this shape, measured BOTH ways on the
     rectangular enc-dec attention — fused core kernel vs XLA fallback
     (module hook layers.FUSED_RECT_DISABLE) — so the routing ships with
     the in-step verdict, not the standalone probe's.

One JSON line per row. Timing fetches a dependent loss value
(block_until_ready does not synchronize on the axon relay).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_nar_bench_r04.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

ROWS = [
    {"name": "nar_mnist_r4_defaults", "preset": "nar_mnist"},
    {"name": "nar_bair_rect_fused", "preset": "nar_bair",
     "rect_disable": False},
    {"name": "nar_bair_rect_xla", "preset": "nar_bair", "rect_disable": True},
    # BASELINE config 4 at its literal geometry (KTH grayscale 128x128,
    # 10 -> 20/40): the 16x16-latent path (16 windows/frame) on real
    # hardware — the preset previously had only a CPU smoke test.
    # At the preset's batch 16 the un-remat'd step needs 22.4G of the
    # chip's 15.75G HBM (measured, this session); the two ways to fit are
    # half batch or block remat — both measured so the preset ships with
    # the faster one documented.
    {"name": "nar_kth_128_b8", "preset": "nar_kth_128",
     "override": {"data": {"batch_size": 8}}},
    {"name": "nar_kth_128_b16_remat", "preset": "nar_kth_128",
     "override": {"transformer": {"remat": True}}},
]


def run_row(row: dict, steps: int) -> dict:
    from vptr_tpu.config import get_preset
    from vptr_tpu.models import layers
    from vptr_tpu.train.trainer import Trainer

    prev_rect_disable = layers.FUSED_RECT_DISABLE
    layers.FUSED_RECT_DISABLE = bool(row.get("rect_disable"))
    try:
        cfg = get_preset(row["preset"]).override(
            {"dtype": "bfloat16", **row.get("override", {})})
        trainer = Trainer(cfg, write_outputs=False)
        state = trainer.init_state()
        d = cfg.data
        batch = d.batch_size
        rng = np.random.default_rng(0)
        clips = lambda t: rng.random(
            (batch, t, d.img_size, d.img_size, d.img_channels), np.float32)

        # k DISTINCT batches per dispatch (identical copies would let XLA
        # CSE across scan steps and misstate the step time — bench.py's
        # k>1 path does the same); ceil division so --steps not divisible
        # by k rounds up instead of silently timing fewer steps
        k = trainer.steps_per_dispatch
        bk = trainer.put_batch_stacked(
            np.stack([clips(d.num_past_frames) for _ in range(k)]),
            np.stack([clips(d.num_future_frames) for _ in range(k)]))
        dispatches = max(1, -(-steps // k))

        t_c = time.perf_counter()
        state, metrics = trainer.multi_train_step(state, *bk)
        loss0 = float(metrics["T_total"][0])
        compile_s = time.perf_counter() - t_c

        t0 = time.perf_counter()
        for _ in range(dispatches):
            state, metrics = trainer.multi_train_step(state, *bk)
        loss = float(metrics["T_total"][-1])
        dt = time.perf_counter() - t0
        n = dispatches * k
        frames = batch * d.num_future_frames     # NAR predicts Tf per step
        return {"row": row["name"], "ms_per_step": round(1e3 * dt / n, 2),
                "frames_per_sec": round(frames * n / dt, 1),
                "compile_s": round(compile_s, 1),
                "loss_first": round(loss0, 6), "loss_last": round(loss, 6)}
    finally:
        layers.FUSED_RECT_DISABLE = prev_rect_disable


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", nargs="*", default=[r["name"] for r in ROWS])
    p.add_argument("--steps", type=int, default=32)
    args = p.parse_args()
    by_name = {r["name"]: r for r in ROWS}
    for name in args.rows:
        try:
            print(json.dumps(run_row(by_name[name], args.steps)), flush=True)
        except Exception as e:
            print(json.dumps({"row": name, "error": repr(e)[:500]}),
                  flush=True)


if __name__ == "__main__":
    main()
