"""Stage-1 AE inspection — script equivalent of the reference's
Test_AutoEncoder.ipynb: load a checkpoint, reconstruct clips from the test
set, save comparison strips, print PSNR/SSIM.

    python examples/test_autoencoder.py --preset ae_mnist \\
        --ckpt-dir /tmp/ae [--num-frames 20] [--out recon.png]
"""

from __future__ import annotations

# runnable from anywhere: put the repo root on sys.path when the package
# is not installed
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse

import jax
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="ae_mnist")
    parser.add_argument("--ckpt-dir", required=True)
    parser.add_argument("--num-frames", type=int, default=20)
    parser.add_argument("--out", default="ae_recon.png")
    parser.add_argument("--set", action="append")
    args = parser.parse_args()

    from vptr_tpu.cli import _apply_sets
    from vptr_tpu.config import get_preset
    from vptr_tpu.data.loader import build_loader
    from vptr_tpu.eval.metrics import psnr, ssim
    from vptr_tpu.train.trainer import Trainer

    cfg = _apply_sets(get_preset(args.preset).override(
        {"ckpt_dir": args.ckpt_dir}), args.set)
    trainer = Trainer(cfg, write_outputs=False)
    from vptr_tpu.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(f"{args.ckpt_dir}/ckpt")
    state = ckpt.restore(trainer.init_state())

    loader = build_loader(cfg.data, split="test", seed=cfg.seed)
    past, future = next(iter(loader))
    past_d, future_d = trainer.put_batch(past, future)
    x = np.concatenate([past, future], axis=1)[:, :args.num_frames]

    import jax.numpy as jnp

    xj = jnp.concatenate([past_d, future_d], axis=1)[:, :args.num_frames]
    feats = trainer.enc.apply(state.enc.variables(), xj, train=False)
    rec = trainer.dec.apply(state.dec.variables(), feats, train=False)
    rec = np.asarray(jax.device_get(rec), np.float32)

    renorm = trainer.renorm
    x_img = np.clip(renorm(x), 0, 1)
    r_img = np.clip(renorm(rec), 0, 1)
    n, t = x_img.shape[:2]
    print("reconstruction PSNR:",
          float(psnr(jnp.asarray(r_img.reshape((-1,) + r_img.shape[2:])),
                     jnp.asarray(x_img.reshape((-1,) + x_img.shape[2:])))))
    print("reconstruction SSIM:",
          float(ssim(jnp.asarray(r_img.reshape((-1,) + r_img.shape[2:])),
                     jnp.asarray(x_img.reshape((-1,) + x_img.shape[2:])))))

    # strip image: row 0 = ground truth frames, row 1 = reconstructions
    from PIL import Image

    k = min(8, t)
    gt_row = np.concatenate([x_img[0, i] for i in range(k)], axis=1)
    rc_row = np.concatenate([r_img[0, i] for i in range(k)], axis=1)
    strip = np.concatenate([gt_row, rc_row], axis=0)
    if strip.shape[-1] == 1:
        strip = np.repeat(strip, 3, axis=-1)
    Image.fromarray((strip * 255).astype(np.uint8)).save(args.out)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
