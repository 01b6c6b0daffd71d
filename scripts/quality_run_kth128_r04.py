"""Round-4 quality run #2: BASELINE config 4 at its literal geometry —
VPTR-NAR, grayscale 128x128, 10 past -> 10 future train, 10 -> 20/40
chained eval — end-to-end on the dynamic synthetic surrogate, on-chip.

BASELINE.json's config 4 names "VPTR-NAR KTH grayscale 128x128
(10 -> 20/40)". The reference *code* trains KTH at 64x64 (utils/
dataset.py:24-25 resizes to 64 — see README "Reference parity notes"),
so 128^2 has no upstream recipe; the `nar_kth_128` preset exists so the
16x16-latent path (16 windows/frame, geometry-bound frame_queries and
pos embeds) is a shipped, tested configuration. Until this run it had
only a CPU smoke test; this trains and evaluates it on the real chip.

Eval protocol: the reference tests KTH at 10 -> 20 and 10 -> 40
(README table; Test_VPTR.ipynb chains NAR blocks). With Tf=10, the
10 -> 40 chain is 4 exact blocks whose first 2 blocks are bit-identical
to the 10 -> 20 chain (NAR chaining is causal in blocks), so ONE
40-frame rollout yields both protocol curves; the 20-curve reported is
the 40-curve's first half.

    PYTHONPATH=/root/repo:/root/.axon_site python \
        scripts/quality_run_kth128_r04.py --steps 4096 --out results_r04

Exits 3 when more stage-2 epochs remain (rerun-while-rc==3 — the
bounded-lifetime protocol for the leaky relay client, see CLAUDE.md).
Writes <out>/kth128_{history,eval}.json and <out>/kth128_gifs/.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def ensure_ae(ckpt_root: str, ae_epochs: int, out: Path) -> str:
    """Stage-1 AE at 128^2 grayscale (GAN recipe, train_AutoEncoder.py).

    Clips only need to supply recon frames at stage 1, so they are
    shortened to 10 frames (2+8) to bound the 4x-pixel cost; the AE is
    frame-wise and indifferent to clip length."""
    from vptr_tpu.config import get_preset
    from vptr_tpu.train.checkpoint import CheckpointManager
    from vptr_tpu.train.trainer import Trainer

    ae_dir = f"{ckpt_root}/ae_kth128"
    cfg = get_preset("ae_kth").override({
        "dtype": "bfloat16", "ckpt_dir": ae_dir, "ckpt_keep": 1,
        "val_per_epochs": 3,
        "data": {"img_size": 128, "num_past_frames": 2,
                 "num_future_frames": 8},
    })
    mgr_dir = str(Path(ae_dir) / "ckpt")
    done_epochs = 0
    try:
        mgr = CheckpointManager(mgr_dir)
        done_epochs = int(mgr.load_history().get("epoch", 0))
    except Exception:
        pass
    if done_epochs < ae_epochs:
        trainer = Trainer(cfg)
        trainer.train(epochs=ae_epochs - done_epochs)
        (out / "kth128_ae_history.json").write_text(
            json.dumps(trainer.history, indent=1))
    return mgr_dir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=4096)
    p.add_argument("--ae-epochs", type=int, default=6)
    p.add_argument("--out", default="results_r04")
    p.add_argument("--ckpt-dir", default="/tmp/quality_kth128_r04")
    p.add_argument("--eval-batches", type=int, default=8)
    p.add_argument("--ckpt-per-epochs", type=int, default=4)
    p.add_argument("--val-per-epochs", type=int, default=4)
    p.add_argument("--chunk-epochs", type=int, default=None)
    p.add_argument("--gif-clips", type=int, default=4)
    args = p.parse_args()

    from vptr_tpu.config import get_preset
    from vptr_tpu.data.loader import build_loader
    from vptr_tpu.eval.harness import evaluate, make_predict_fn
    from vptr_tpu.train.summary import visualize_batch_clips
    from vptr_tpu.train.trainer import Trainer

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    t_start = time.time()
    ae_ckpt = ensure_ae(args.ckpt_dir, args.ae_epochs, out)

    # ---- stage 2: NAR at 128^2, 10 -> 10 (same recipe as nar_kth;
    # reference: train_NAR.py:160-216 modulo the geometry) ----
    cfg = get_preset("nar_kth_128").override({
        "dtype": "bfloat16",
        "ckpt_dir": f"{args.ckpt_dir}/nar_kth128",
        "ckpt_keep": 1,
        "ckpt_per_epochs": args.ckpt_per_epochs,
        "val_per_epochs": args.val_per_epochs,
        "ae_ckpt": ae_ckpt,
        # round-4 composed default (first moment in bf16), as in the
        # BAIR-geometry run — this run doubles as its second
        # training-quality validation at a different geometry.
        "optim": {"mu_dtype": "bfloat16"},
    })
    steps_per_epoch = 4096 // cfg.data.batch_size
    epochs = max(1, args.steps // steps_per_epoch)

    done_epochs = 0
    try:
        from vptr_tpu.train.checkpoint import CheckpointManager

        done_epochs = int(CheckpointManager(
            str(Path(cfg.ckpt_dir) / "ckpt")).load_history().get("epoch", 0))
    except Exception:
        pass
    remaining = epochs - done_epochs
    this_proc = (min(remaining, args.chunk_epochs)
                 if args.chunk_epochs else remaining)
    trainer = Trainer(cfg)
    state = trainer.train(epochs=max(this_proc, 0))

    (out / "kth128_history.json").write_text(
        json.dumps(trainer.history, indent=1))
    if done_epochs + this_proc < epochs:
        print(f"chunk done: epoch {done_epochs + this_proc}/{epochs}; "
              "rerun to continue", flush=True)
        sys.exit(3)

    # ---- eval: ONE 10 -> 40 chained rollout (4 exact NAR blocks);
    # the 10 -> 20 protocol curve is its first 20 entries ----
    loader = build_loader(cfg.data, split="test", seed=cfg.seed)
    assert cfg.data.test_future_frames == 40
    curves40 = evaluate(trainer, state, loader, mode="nar", num_pred=40,
                        max_batches=args.eval_batches)
    results = {"preset": "nar_kth_128", "epochs": epochs,
               "steps_per_epoch": steps_per_epoch,
               "ae_epochs": args.ae_epochs,
               "task": ("dynamic synthetic at KTH-128 geometry (grayscale "
                        "128x128, accelerated + colliding digits, pixel "
                        "noise 0.03; real KTH unavailable — zero egress)"),
               "eval": ("10 past -> 40 predicted, NAR chained 10x4; the "
                        "10->20 protocol is the first 20 entries (causal "
                        "block chaining, exact block boundary)"),
               "wall_hours": round((time.time() - t_start) / 3600, 2),
               "curves_10_to_40": {m: [round(float(v), 4) for v in c]
                                   for m, c in curves40.items()},
               "summary": {}}
    for m, c in curves40.items():
        results["summary"][m] = {
            "mean_20": round(float(np.mean(c[:20])), 4),
            "mean_40": round(float(np.mean(c)), 4),
            "t0": round(float(c[0]), 4),
            "t19": round(float(c[19]), 4),
            "t39": round(float(c[-1]), 4)}
        print(m, results["summary"][m], flush=True)
    (out / "kth128_eval.json").write_text(json.dumps(results, indent=1))

    # ---- GIFs: past | gt 40 future | 40-frame chained prediction ----
    import jax

    past, future = next(iter(loader))
    past, future = past[:args.gif_clips], future[:args.gif_clips]
    predict = make_predict_fn(trainer, state, "nar", 40)
    pred = np.asarray(jax.device_get(
        predict(*trainer.put_batch(past, future))))
    visualize_batch_clips(past, future[:, :40], pred[:, :40],
                          str(out / "kth128_gifs"), renorm=trainer.renorm,
                          desc="nar_10to40")
    print("wrote", out / "kth128_eval.json", "and",
          out / "kth128_gifs", flush=True)


if __name__ == "__main__":
    main()
