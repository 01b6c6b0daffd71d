"""Round-4 quality run: the published headline SHAPE, end-to-end on the
dynamic synthetic surrogate — VPTR-NAR at BAIR geometry (3-channel 64x64,
tanh output, 2 past -> 10 future train, 2 -> 28 chained eval).

The reference's headline numbers (README "Correction about the paper",
docs/Table2_Corrected.png) are BAIR 2->28: train_NAR.py:160-216 trains
2->10 and Test_VPTR.ipynb's ``NAR_BAIR_2_to_28_test_single_iter`` chains
10+10+8 with a partial last block. No committed quality run had touched
Tp != Tf attention (rectangular fused kernel), 3-channel frames, tanh
output, or that chaining — this run covers all four. Real BAIR cannot
enter this environment (zero egress); the dynamic synthetic task is the
surrogate, as in rounds 2-3.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/quality_run_r04.py \
        --steps 12800 --out results_r04 --chunk-epochs 12

Exits 3 when more epochs remain (rerun-while-rc==3, the bounded-lifetime
protocol for the leaky relay client — see CLAUDE.md). Writes
<out>/nar_bair_{history,eval}.json and <out>/nar_bair_gifs/ (past | gt 28
future | pred 28 future side-by-side strips).
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
    """Train (or resume) the stage-1 AE at BAIR geometry (3-channel, tanh,
    per-channel normalization — reference: train_AutoEncoder.py:132 output
    layer choice); returns its ckpt directory."""
    from vptr_tpu.config import get_preset
    from vptr_tpu.train.checkpoint import CheckpointManager
    from vptr_tpu.train.trainer import Trainer

    ae_dir = f"{ckpt_root}/ae_bair"
    cfg = get_preset("ae_bair").override({
        "dtype": "bfloat16", "ckpt_dir": ae_dir, "ckpt_keep": 1,
        "val_per_epochs": 2,
        # clips only need Tp+Tf = 12 frames at stage 1 for this surrogate;
        # keep the AE batch geometry at the preset's 32
        "data": {"num_past_frames": 2, "num_future_frames": 10},
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
        (out / "ae_bair_history.json").write_text(
            json.dumps(trainer.history, indent=1))
    return mgr_dir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=12800)
    p.add_argument("--ae-epochs", type=int, default=10)
    p.add_argument("--out", default="results_r04")
    p.add_argument("--ckpt-dir", default="/tmp/quality_r04")
    p.add_argument("--eval-batches", type=int, default=8)
    p.add_argument("--ckpt-per-epochs", type=int, default=3)
    p.add_argument("--val-per-epochs", type=int, default=2,
                   help="stage-2 val cadence (each val epoch costs ~70 s "
                   "on the relay: val pass + GIF host transfer)")
    p.add_argument("--chunk-epochs", type=int, default=None,
                   help="train at most this many stage-2 epochs per process, "
                   "then exit 3 if more remain (relay client leaks host RSS; "
                   "see quality_run_r03.py for the measured numbers)")
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

    # ---- stage 2: NAR at the published recipe (train_NAR.py:160-216) ----
    cfg = get_preset("nar_bair").override({
        "dtype": "bfloat16",
        "ckpt_dir": f"{args.ckpt_dir}/nar_bair",
        "ckpt_keep": 1,
        "ckpt_per_epochs": args.ckpt_per_epochs,
        "val_per_epochs": args.val_per_epochs,
        "ae_ckpt": ae_ckpt,
        # the round-4 composed bench config: first-moment bf16 halves the
        # AdamW update's mu traffic (sweep: -1.3 ms/step, losses matching
        # to 1e-5 over 48 steps). Running the quality stage with it makes
        # this run the training-quality validation for that bench default.
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

    (out / "nar_bair_history.json").write_text(
        json.dumps(trainer.history, indent=1))
    if done_epochs + this_proc < epochs:
        print(f"chunk done: epoch {done_epochs + this_proc}/{epochs}; "
              "rerun to continue", flush=True)
        sys.exit(3)

    # ---- eval: 2 -> 28 chained NAR (10+10+8, partial last block — the
    # notebook's NAR_BAIR_2_to_28_test_single_iter) ----
    loader = build_loader(cfg.data, split="test", seed=cfg.seed)
    assert cfg.data.test_future_frames == 28
    curves = evaluate(trainer, state, loader, mode="nar", num_pred=28,
                      max_batches=args.eval_batches)
    results = {"preset": "nar_bair", "epochs": epochs,
               "steps_per_epoch": steps_per_epoch,
               "ae_epochs": args.ae_epochs,
               "task": ("dynamic synthetic at BAIR geometry (3-channel, "
                        "accelerated + colliding digits, pixel noise 0.03; "
                        "real BAIR unavailable in this environment)"),
               "eval": "2 past -> 28 predicted, NAR chained 10+10+8",
               "wall_hours": round((time.time() - t_start) / 3600, 2),
               "curves": {m: [round(float(v), 4) for v in c]
                          for m, c in curves.items()}}
    for m, c in curves.items():
        print(m, "mean", round(float(np.mean(c)), 4),
              "t0", round(float(c[0]), 4), "t27", round(float(c[-1]), 4),
              flush=True)
    (out / "nar_bair_eval.json").write_text(json.dumps(results, indent=1))

    # ---- GIFs: past | gt future | 28-frame chained prediction ----
    import jax

    past, future = next(iter(loader))
    past, future = past[:args.gif_clips], future[:args.gif_clips]
    predict = make_predict_fn(trainer, state, "nar", 28)
    pred = np.asarray(jax.device_get(
        predict(*trainer.put_batch(past, future))))
    visualize_batch_clips(past, future[:, :28], pred[:, :28],
                          str(out / "nar_bair_gifs"), renorm=trainer.renorm,
                          desc="nar_2to28")
    print("wrote", out / "nar_bair_eval.json", "and",
          out / "nar_bair_gifs", flush=True)


if __name__ == "__main__":
    main()
