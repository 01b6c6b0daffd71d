"""Probe: does far_bair_dp fit one v5e chip at a reduced batch?

The preset ships the reference's TOTAL multi-GPU batch 64
(reference: train_FAR_mp.py:304 — 64 split across ranks); on one 15.75G
chip the un-remat'd bf16 train step needs 24.7G (smoke_r05.log). This
compiles + runs ONE train step at --batch to find the single-chip
operating point for the round-5 quality run.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/far_bair_mem_probe.py --batch 32
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--steps", type=int, default=4)
    args = p.parse_args()

    from vptr_tpu.config import get_preset
    from vptr_tpu.train.trainer import Trainer

    cfg = get_preset("far_bair_dp").override({
        "dtype": "bfloat16",
        "ckpt_dir": "/tmp/far_bair_mem_probe",
        "optim": {"mu_dtype": "bfloat16"},
        "data": {"batch_size": args.batch},
        "transformer": {"remat": args.remat},
    })
    tr = Trainer(cfg)
    state = tr.init_state()
    d = cfg.data
    rng = np.random.default_rng(0)
    past = rng.normal(size=(args.batch, d.num_past_frames, d.img_size,
                            d.img_size, d.img_channels)).astype(np.float32)
    future = rng.normal(size=(args.batch, d.num_future_frames, d.img_size,
                              d.img_size, d.img_channels)).astype(np.float32)
    batches = [tr.put_batch(past + i, future + i) for i in range(2)]
    t0 = time.time()
    state, m = tr.train_step(state, *batches[0])
    print("compile+step1:", round(time.time() - t0, 1), "s, T_total",
          float(m["T_total"]), flush=True)
    t0 = time.time()
    for i in range(args.steps):
        state, m = tr.train_step(state, *batches[i % 2])
    val = float(m["T_total"])  # host fetch = sync (block_until_ready lies)
    dt = time.time() - t0
    fps = args.batch * d.num_future_frames * args.steps / dt
    print(f"batch={args.batch} remat={args.remat} steady "
          f"{dt / args.steps:.3f} s/step, {fps:.1f} frames/s, "
          f"T_total {val:.4f}", flush=True)


if __name__ == "__main__":
    main()
