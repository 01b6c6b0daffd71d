"""Full-pipeline inference — script equivalent of the reference's
Test_VPTR.ipynb: load stage-1 + stage-2 checkpoints, run any of the four
rollout strategies, report per-timestep PSNR/SSIM(/LPIPS) curves and save
prediction GIFs.

    python examples/test_vptr.py --preset far_mnist --ckpt-dir /tmp/far \\
        --mode far_rip --num-pred 10 --gif-dir ./pred_gifs

Modes (reference: Test_VPTR.ipynb cells 5-11):
  far       teacher-forced one-shot
  far_rip   autoregressive, decode->re-encode each frame (canonical)
  far_ril   autoregressive, latent feedback ("worse result" per upstream)
  nar       NAR block chaining (e.g. BAIR 2->28 as 10+10+8)
"""

from __future__ import annotations

# runnable from anywhere: put the repo root on sys.path when the package
# is not installed
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", required=True)
    parser.add_argument("--ckpt-dir", required=True)
    parser.add_argument("--mode", default="far_rip",
                        choices=["far", "far_rip", "far_ril", "nar"])
    parser.add_argument("--num-pred", type=int, default=None)
    parser.add_argument("--max-batches", type=int, default=8)
    parser.add_argument("--lpips", action="store_true")
    parser.add_argument("--gif-dir", default=None)
    parser.add_argument("--set", action="append")
    args = parser.parse_args()

    from vptr_tpu.cli import _apply_sets
    from vptr_tpu.config import get_preset
    from vptr_tpu.data.loader import build_loader
    from vptr_tpu.eval.harness import evaluate, make_predict_fn
    from vptr_tpu.eval.lpips import make_lpips_fn
    from vptr_tpu.train.checkpoint import CheckpointManager
    from vptr_tpu.train.summary import visualize_batch_clips
    from vptr_tpu.train.trainer import Trainer

    cfg = _apply_sets(get_preset(args.preset).override(
        {"ckpt_dir": args.ckpt_dir}), args.set)
    trainer = Trainer(cfg, write_outputs=False)
    ckpt = CheckpointManager(f"{args.ckpt_dir}/ckpt")
    state = ckpt.restore(trainer.init_state())

    num_pred = args.num_pred or cfg.data.test_future_frames
    loader = build_loader(cfg.data, split="test", seed=cfg.seed)
    lpips_fn = make_lpips_fn() if args.lpips else None
    curves = evaluate(trainer, state, loader, mode=args.mode,
                      num_pred=num_pred, lpips_fn=lpips_fn,
                      max_batches=args.max_batches)
    for m, c in curves.items():
        print(f"{m:6s} per-timestep:",
              " ".join(f"{v:.4f}" for v in c),
              f"| mean {np.mean(c):.4f}")

    if args.gif_dir:
        predict = make_predict_fn(trainer, state, args.mode, num_pred)
        past, future = next(iter(loader))
        pred = np.asarray(predict(*trainer.put_batch(past, future)),
                          np.float32)
        visualize_batch_clips(past, future[:, :num_pred], pred[:, :num_pred],
                              args.gif_dir, renorm=trainer.renorm,
                              desc=f"pred_{args.mode}")
        print("wrote GIFs to", args.gif_dir)


if __name__ == "__main__":
    main()
