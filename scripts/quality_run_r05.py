"""Round-5 quality run: NAR **and** FAR at the published BAIR headline
geometry, with the CORRECTED reference recipe, trained deep enough that
the 2 -> 28 horizon curve actually slopes.

Round 4's run proved the machinery (rect attention, 3-channel, tanh,
10+10+8 chaining) but trained 14 epochs at the WRONG recipe constants —
BiPatchNCE temperature 0.07 instead of the 1.0 both reference NAR scripts
pass (reference: train_NAR.py:213, train_NAR_mp.py:128), reflect AE
padding instead of BAIR's zero (reference: train_NAR.py:171,188-189,
train_FAR_mp.py:293), and flip augmentation BAIR's transform lacks
(reference: utils/dataset.py:52-55) — and produced an essentially flat
horizon curve with no FAR comparand. This run uses the fixed presets
(config.py) + fixed loader, trains both stages from one shared frozen AE
exactly as the reference does (both train_NAR.py:166-191 and
train_FAR_mp.py:289-295 load the same stage-1 AE), and evaluates both
2 -> 28 — NAR chained 10+10+8 (Test_VPTR.ipynb
``NAR_BAIR_2_to_28_test_single_iter``) vs FAR autoregressive
pixel-recurrence (Test_VPTR.ipynb FAR RIP cell) — to demonstrate the
published NAR-vs-FAR ordering (docs/Table2_Corrected.png: NAR 17.77 vs
FAR 15.76 PSNR) on the surrogate task.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/quality_run_r05.py \
        --epochs 50 --out results_r05 --chunk-epochs 25

Exits 3 when more epochs remain in EITHER stage (rerun-while-rc==3, the
bounded-lifetime protocol for the leaky relay client — see CLAUDE.md).
Writes <out>/{nar,far}_bair_{history,eval}.json, <out>/comparison.json,
and side-by-side GIF strips under <out>/{nar,far}_bair_gifs/.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def done_epochs(ckpt_dir: str) -> int:
    from vptr_tpu.train.checkpoint import CheckpointManager

    try:
        mgr = CheckpointManager(str(Path(ckpt_dir) / "ckpt"))
        return int(mgr.load_history().get("epoch", 0))
    except Exception:
        return 0


def ensure_ae(ckpt_root: str, ae_epochs: int, out: Path) -> str:
    """Train (or resume) the shared stage-1 AE at BAIR geometry — now with
    the reference's ZERO padding via the fixed ae_bair preset (reference:
    train_NAR.py:171 padding_type='zero'); both stage-2 recipes consume
    this one frozen AE, as the reference's scripts do."""
    from vptr_tpu.config import get_preset
    from vptr_tpu.train.trainer import Trainer

    ae_dir = f"{ckpt_root}/ae_bair"
    cfg = get_preset("ae_bair").override({
        "dtype": "bfloat16", "ckpt_dir": ae_dir, "ckpt_keep": 1,
        "val_per_epochs": 2,
        "data": {"num_past_frames": 2, "num_future_frames": 10},
    })
    assert cfg.ae.padding_type == "zero"
    done = done_epochs(ae_dir)
    if done < ae_epochs:
        trainer = Trainer(cfg)
        trainer.train(epochs=ae_epochs - done)
        (out / "ae_bair_history.json").write_text(
            json.dumps(trainer.history, indent=1))
    return str(Path(ae_dir) / "ckpt")


def train_stage(preset: str, ckpt_dir: str, ae_ckpt: str, epochs: int,
                args, out: Path, tag: str):
    """Train one stage-2 recipe for up to --chunk-epochs this process.
    Returns (trainer, state, remaining_epochs)."""
    from vptr_tpu.config import get_preset
    from vptr_tpu.train.trainer import Trainer

    overrides = {
        "dtype": "bfloat16",
        "ckpt_dir": ckpt_dir,
        "ckpt_keep": 1,
        "ckpt_per_epochs": args.ckpt_per_epochs,
        "val_per_epochs": args.val_per_epochs,
        "ae_ckpt": ae_ckpt,
        # round-4 composed bench default; its training-quality validation
        # carried over from the r4 run (losses matched f32 to 1e-5/48 steps)
        "optim": {"mu_dtype": "bfloat16"},
    }
    if preset == "far_bair_dp":
        # the preset ships the reference's TOTAL multi-GPU batch 64
        # (train_FAR_mp.py:304, split across ranks); un-remat'd on ONE
        # 15.75G chip that needs 24.7G. Batch 32 fits and runs at
        # 992.9 frames/s (scripts/far_bair_mem_probe.py) — same
        # per-device batch a 2-rank reference run would use.
        overrides["data"] = {"batch_size": 32}
    cfg = get_preset(preset).override(overrides)
    done = done_epochs(ckpt_dir)
    remaining = epochs - done
    this_proc = (min(remaining, args.chunk_epochs)
                 if args.chunk_epochs else remaining)
    trainer = Trainer(cfg)
    state = trainer.train(epochs=max(this_proc, 0))
    if this_proc > 0:
        (out / f"{tag}_history.json").write_text(
            json.dumps(trainer.history, indent=1))
    return trainer, state, remaining - max(this_proc, 0)


def eval_stage(trainer, state, mode: str, out: Path, tag: str,
               args, meta: dict) -> dict:
    """2 -> 28 rollout eval + GIF strips for one trained stage."""
    import jax

    from vptr_tpu.data.loader import build_loader
    from vptr_tpu.eval.harness import evaluate, make_predict_fn
    from vptr_tpu.train.summary import visualize_batch_clips

    cfg = trainer.cfg
    assert cfg.data.test_future_frames == 28
    loader = build_loader(cfg.data, split="test", seed=cfg.seed)
    curves = evaluate(trainer, state, loader, mode=mode, num_pred=28,
                      max_batches=args.eval_batches)
    results = dict(meta)
    results["curves"] = {m: [round(float(v), 4) for v in c]
                         for m, c in curves.items()}
    for m, c in curves.items():
        print(tag, m, "mean", round(float(np.mean(c)), 4),
              "t0", round(float(c[0]), 4), "t27", round(float(c[-1]), 4),
              flush=True)
    (out / f"{tag}_eval.json").write_text(json.dumps(results, indent=1))

    past, future = next(iter(loader))
    past, future = past[:args.gif_clips], future[:args.gif_clips]
    predict = make_predict_fn(trainer, state, mode, 28)
    pred = np.asarray(jax.device_get(
        predict(*trainer.put_batch(past, future))))
    visualize_batch_clips(past, future[:, :28], pred[:, :28],
                          str(out / f"{tag}_gifs"), renorm=trainer.renorm,
                          desc=f"{tag}_2to28")
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=50,
                   help="stage-2 epochs for EACH of NAR and FAR "
                   "(4096 clips/epoch each — equal data budget)")
    p.add_argument("--ae-epochs", type=int, default=10)
    p.add_argument("--out", default="results_r05")
    p.add_argument("--ckpt-dir", default="/tmp/quality_r05")
    p.add_argument("--eval-batches", type=int, default=8)
    p.add_argument("--ckpt-per-epochs", type=int, default=5)
    p.add_argument("--val-per-epochs", type=int, default=5)
    p.add_argument("--chunk-epochs", type=int, default=None,
                   help="train at most this many stage-2 epochs per "
                   "process then exit 3 if more remain in either stage "
                   "(relay client leaks host RSS; see CLAUDE.md)")
    p.add_argument("--gif-clips", type=int, default=4)
    p.add_argument("--skip-far", action="store_true")
    args = p.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    t_start = time.time()

    ae_ckpt = ensure_ae(args.ckpt_dir, args.ae_epochs, out)

    task_desc = ("dynamic synthetic at BAIR geometry (3-channel, "
                 "accelerated + colliding digits, pixel noise 0.03; "
                 "real BAIR unavailable in this environment — zero egress)")
    recipe = {"nce_temperature": 1.0, "ae_padding": "zero",
              "flips": False, "mu_dtype": "bfloat16",
              "note": ("reference recipe constants: train_NAR.py:213 "
                       "BiPatchNCE(...,1.0); train_NAR.py:171 zero padding; "
                       "utils/dataset.py:52-55 BAIR transform has no flip")}

    # ---- stage 2a: NAR (train_NAR.py:160-216, corrected constants) ----
    nar_tr, nar_state, nar_left = train_stage(
        "nar_bair", f"{args.ckpt_dir}/nar_bair", ae_ckpt,
        args.epochs, args, out, "nar_bair")
    if nar_left > 0:
        print(f"chunk done: NAR {args.epochs - nar_left}/{args.epochs}; "
              "rerun to continue", flush=True)
        sys.exit(3)

    # ---- stage 2b: FAR (train_FAR_mp.py recipe on 1 chip) ----
    far_results = None
    if not args.skip_far:
        far_tr, far_state, far_left = train_stage(
            "far_bair_dp", f"{args.ckpt_dir}/far_bair", ae_ckpt,
            args.epochs, args, out, "far_bair")
        if far_left > 0:
            print(f"chunk done: FAR {args.epochs - far_left}/{args.epochs};"
                  " rerun to continue", flush=True)
            sys.exit(3)

    # ---- evals: 2 -> 28, both decoding schemes ----
    meta = {"epochs": args.epochs, "ae_epochs": args.ae_epochs,
            "task": task_desc, "recipe": recipe}
    nar_results = eval_stage(
        nar_tr, nar_state, "nar", out, "nar_bair", args,
        {**meta, "preset": "nar_bair",
         "eval": "2 past -> 28 predicted, NAR chained 10+10+8"})
    if not args.skip_far:
        far_results = eval_stage(
            far_tr, far_state, "far_rip", out, "far_bair", args,
            {**meta, "preset": "far_bair_dp",
             "eval": "2 past -> 28 predicted, FAR autoregressive "
                     "pixel recurrence (RIP)"})

    # ---- the headline comparison ----
    comparison = {"task": task_desc, "recipe": recipe,
                  "epochs_each": args.epochs,
                  "wall_hours": round((time.time() - t_start) / 3600, 2),
                  "reference_ordering":
                      "BAIR 2->28 mean PSNR: NAR 17.77 > FAR 15.76 "
                      "(docs/Table2_Corrected.png)"}
    for m in nar_results["curves"]:
        nc = np.asarray(nar_results["curves"][m])
        row = {"nar_mean": round(float(nc.mean()), 4),
               "nar_t0": round(float(nc[0]), 4),
               "nar_t27": round(float(nc[-1]), 4)}
        if far_results is not None:
            fc = np.asarray(far_results["curves"][m])
            row.update({"far_mean": round(float(fc.mean()), 4),
                        "far_t0": round(float(fc[0]), 4),
                        "far_t27": round(float(fc[-1]), 4),
                        "nar_beats_far": bool(
                            nc.mean() > fc.mean() if m != "mse"
                            else nc.mean() < fc.mean())})
        comparison[m] = row
    (out / "comparison.json").write_text(json.dumps(comparison, indent=1))
    print(json.dumps(comparison, indent=1), flush=True)


if __name__ == "__main__":
    main()
