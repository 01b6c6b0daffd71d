"""Round-3 quality evidence runs on the DYNAMIC synthetic task.

Round 2's linear-bounce task saturated at epoch 1 (RESULTS_r02): all three
FAR rollout modes scored identically with flat horizon curves, so rollout
dynamics were never actually exercised. The loader now defaults to the
dynamic generator (accelerated + colliding + occluding digits, pixel
noise — vptr_tpu/data/datasets.py), whose future frames depend on latent
state that must be inferred from the past. This script trains the full
two-stage pipeline on it and emits the evidence the round-2 verdict asked
for: epoch-vs-metric curves that are not saturated at epoch 1, per-timestep
horizon curves that slope, and rollout-mode separation
(teacher-forced >= far_rip >= far_ril, the ordering the reference documents
in Test_VPTR.ipynb's FAR_RIL docstring).

Stage 1 (conv AE + PatchGAN) trains first — or is reused from a previous
invocation's checkpoint — and stage 2 loads it frozen via ``ae_ckpt``,
exactly like the reference pipeline (train_FAR.py:210).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/quality_run_r03.py \
        --stage far --steps 20000 --out results_r03

Writes <out>/<stage>_history.json (train/val loss curves) and
<out>/<stage>_eval.json (per-timestep PSNR/SSIM/MSE curves per rollout
mode).
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
    """Train (or resume) the shared stage-1 AE; returns its ckpt directory."""
    from vptr_tpu.config import get_preset
    from vptr_tpu.train.checkpoint import CheckpointManager
    from vptr_tpu.train.trainer import Trainer

    ae_dir = f"{ckpt_root}/ae"
    cfg = get_preset("ae_mnist").override({
        "dtype": "bfloat16", "ckpt_dir": ae_dir, "ckpt_keep": 1,
        "val_per_epochs": 2,
    })
    mgr_dir = str(Path(ae_dir) / "ckpt")
    done_epochs = 0
    try:
        mgr = CheckpointManager(mgr_dir)
        hist = mgr.load_history()
        done_epochs = int(hist.get("epoch", 0))
    except Exception:
        pass
    if done_epochs < ae_epochs:
        trainer = Trainer(cfg)
        trainer.train(epochs=ae_epochs - done_epochs)
        (out / "ae_history.json").write_text(
            json.dumps(trainer.history, indent=1))
    return mgr_dir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", choices=["far", "nar"], required=True)
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--ae-epochs", type=int, default=10)
    p.add_argument("--out", default="results_r03")
    p.add_argument("--ckpt-dir", default="/tmp/quality_r03")
    p.add_argument("--eval-batches", type=int, default=8)
    p.add_argument("--attention", default="full",
                   choices=["core", "full"],
                   help="fused attention flavor for the stage-2 run")
    p.add_argument("--ckpt-per-epochs", type=int, default=3,
                   help="stage-2 checkpoint cadence; raise for long runs "
                   "(a full-state orbax save over the relay costs ~5 min)")
    p.add_argument("--chunk-epochs", type=int, default=None,
                   help="train at most this many stage-2 epochs, then exit "
                   "with code 3 if more remain. The relay client's host RSS "
                   "grows over multi-hour runs (leak is client-side, outside "
                   "this repo); bounded-lifetime processes reset it, and the "
                   "relay's server-side compile cache makes process restarts "
                   "cheap (measured: 204s first compile, 2.2s second process "
                   "— scripts/tpu_cache_probe.py)")
    args = p.parse_args()

    from vptr_tpu.config import get_preset
    from vptr_tpu.data.loader import build_loader
    from vptr_tpu.eval.harness import evaluate
    from vptr_tpu.train.trainer import Trainer

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    t_start = time.time()
    # ---- stage 1: shared frozen AE (reference: train_AutoEncoder.py) ----
    ae_ckpt = ensure_ae(args.ckpt_dir, args.ae_epochs, out)

    # ---- stage 2 ----
    preset = "far_mnist" if args.stage == "far" else "nar_mnist"
    cfg = get_preset(preset).override({
        "dtype": "bfloat16",
        "ckpt_dir": f"{args.ckpt_dir}/{args.stage}",
        "ckpt_keep": 1,
        "ckpt_per_epochs": args.ckpt_per_epochs,
        "val_per_epochs": 2,
        "ae_ckpt": ae_ckpt,
        "transformer": {"fused_full": args.attention == "full"},
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

    (out / f"{args.stage}_history.json").write_text(
        json.dumps(trainer.history, indent=1))
    if done_epochs + this_proc < epochs:
        print(f"chunk done: epoch {done_epochs + this_proc}/{epochs}; "
              "rerun to continue", flush=True)
        sys.exit(3)

    # per-timestep metric curves for every applicable rollout mode
    modes = ["far", "far_rip", "far_ril"] if args.stage == "far" else ["nar"]
    loader = build_loader(cfg.data, split="test", seed=cfg.seed)
    results = {"preset": preset, "epochs": epochs,
               "steps_per_epoch": steps_per_epoch,
               "ae_epochs": args.ae_epochs,
               "task": "dynamic synthetic (accelerated + colliding digits, "
                       "pixel noise 0.03; real MovingMNIST unavailable in "
                       "this environment)",
               "wall_hours": round((time.time() - t_start) / 3600, 2)}
    for mode in modes:
        curves = evaluate(trainer, state, loader, mode=mode, num_pred=10,
                          max_batches=args.eval_batches)
        results[mode] = {m: [round(float(v), 4) for v in c]
                         for m, c in curves.items()}
        print(mode, {m: round(float(np.mean(c)), 4)
                     for m, c in results[mode].items()}, flush=True)
    if args.stage == "far":
        order = [float(np.mean(results[m]["psnr"]))
                 for m in ("far", "far_rip", "far_ril")]
        results["mode_ordering_psnr"] = dict(
            zip(("far", "far_rip", "far_ril"), [round(v, 4) for v in order]))
    (out / f"{args.stage}_eval.json").write_text(json.dumps(results, indent=1))
    print("wrote", out / f"{args.stage}_eval.json")


if __name__ == "__main__":
    main()
