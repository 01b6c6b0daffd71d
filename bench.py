"""Headline benchmark: MovingMNIST training throughput per chip.

Default measures the full stage-2 FAR training step at the reference
geometry (train_FAR.py:154-197: 12 encoder layers, d_model 528, heads 8,
window 4, batch 10, 64x64 frames -> 8x8x528 latents): frozen conv encode,
transformer forward+backward, frozen decode, AdamW update — in bfloat16 on
one chip. ``--preset nar_mnist`` measures the NAR step at the train_NAR
recipe (4 enc + 8 dec layers, RPE, NCE head, batch 16).

Prints ONE JSON line:
  {"metric": ..., "value": frames/sec/chip, "unit": ..., "vs_baseline": ...}

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6),
so the baseline is an analytic model of the PyTorch reference on A100:
step FLOPs from the same estimator, A100 bf16 peak 312 TFLOP/s at 40% MFU
(a generous assumption for an eager per-frame torch loop with host-built
masks). vs_baseline > 1 means this framework on one v5e chip beats that
A100 estimate.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# whole-step composite speed-of-light on THIS chip (ms) at each preset's
# reference batch, keyed by (preset, optim.mu_dtype) — the output of
# scripts/composite_roofline.py at its measured default ceilings (60 TF/s
# shape-GEMM / 150 TF/s conv / 187 GB/s HBM). Hardcoded so bench.py stays
# dependency-light on the TPU; tests/test_composite_roofline.py re-runs
# the script for every key and fails on drift.
COMPOSITE_BOUND_MS = {
    ("far_mnist", "float32"): 142.71, ("far_mnist", "bfloat16"): 140.82,
    ("nar_mnist", "float32"): 172.65, ("nar_mnist", "bfloat16"): 170.12,
    ("nar_bair", "float32"): 141.06, ("nar_bair", "bfloat16"): 138.53,
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="far_mnist",
                        choices=["far_mnist", "nar_mnist", "nar_bair"],
                        help="which training step to benchmark (nar_bair = "
                             "the published headline geometry: 3-channel, "
                             "Tp=2 -> Tf=10, rectangular enc-dec attention)")
    parser.add_argument("--batch", type=int, default=None,
                        help="per-chip batch (default: the preset's "
                             "reference batch — FAR 10, NAR 16)")
    parser.add_argument("--steps", type=int, default=24)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--steps-per-dispatch", type=int, default=0,
                        help="fold K steps into one jitted lax.scan "
                             "dispatch (reclaims the measured ~2 ms/step "
                             "residual relay dispatch cost; 0 = auto: 8 "
                             "on TPU, 1 elsewhere — the trainer default)")
    parser.add_argument("--quick", action="store_true",
                        help="tiny config for CI/CPU smoke")
    parser.add_argument("--attention", default="full",
                        choices=["unfused", "core", "full"],
                        help="attention path; default = fastest measured "
                             "(fully-fused window sublayer with in-kernel "
                             "LayerNorm + dropout, temporal attention on "
                             "the fused core — full parity semantics)")
    parser.add_argument("--conv-ffn", action="store_true",
                        help="fused Pallas conv+LayerNorm+GELU in the "
                             "conv-FFN fc1/fc2 stages. Ablation, only "
                             "runnable where the backend is CPU (e.g. with "
                             "JAX_PLATFORMS=cpu, typically alongside "
                             "--quick): measured slower than XLA, and "
                             "build_transformer raises cleanly if the "
                             "backend is TPU — see BENCH_NOTES.md)")
    parser.add_argument("--mu-dtype", default=None,
                        choices=["float32", "bfloat16"],
                        help="Adam first-moment dtype (default: the preset's "
                             "— bfloat16, the round-4 composed config; pass "
                             "float32 for exact reference-parity optimizer "
                             "numerics)")
    parser.add_argument("--dtype", default="bfloat16")
    args = parser.parse_args()

    import jax

    from vptr_tpu.config import get_preset
    from vptr_tpu.train.trainer import Trainer
    from vptr_tpu.utils.misc import nar_step_flops, transformer_step_flops

    batch = args.batch if args.batch is not None else \
        get_preset(args.preset).data.batch_size
    overrides = {"dtype": args.dtype,
                 "steps_per_dispatch": args.steps_per_dispatch,
                 "data": {"batch_size": batch},
                 # dropout stays ACTIVE in all modes: the fused kernels run
                 # attention-weight dropout in-kernel (parity semantics)
                 "transformer": {
                     "fused_attention": args.attention != "unfused",
                     "fused_full": args.attention == "full",
                     "fused_conv_ffn": args.conv_ffn}}
    if args.mu_dtype:
        overrides["optim"] = {"mu_dtype": args.mu_dtype}
    if args.quick:
        overrides["ae"] = {"feat_dim": 24, "n_res_blocks": 1}
        # merge, don't replace: the dict at "transformer" already carries
        # the --attention / --conv-ffn selections
        overrides["transformer"].update({
            "d_model": 24, "n_heads": 4,
            "num_encoder_layers": 2, "num_decoder_layers": 2})
    cfg = get_preset(args.preset).override(overrides)
    trainer = Trainer(cfg, write_outputs=False)
    state = trainer.init_state()

    d = cfg.data
    rng = np.random.default_rng(0)
    k = trainer.steps_per_dispatch

    def rand_clips(n, t):
        return rng.random((n, t, d.img_size, d.img_size, d.img_channels),
                          np.float32)

    # NOTE: block_until_ready does not actually synchronize on the axon
    # relay platform — only a host fetch of a dependent value does. The
    # fetched loss depends transitively on every step in the chain.
    if k > 1:
        # K DISTINCT batches per dispatch, scanned on device (the trainer's
        # steps_per_dispatch path — one jit call per K steps)
        past_k = np.stack([rand_clips(batch, d.num_past_frames)
                           for _ in range(k)])
        future_k = np.stack([rand_clips(batch, d.num_future_frames)
                             for _ in range(k)])
        bk = trainer.put_batch_stacked(past_k, future_k)
        dispatches = max(1, -(-args.steps // k))
        n_steps = dispatches * k
        # honor --warmup here too: ceil(warmup / k) warmup dispatches
        for _ in range(max(1, -(-args.warmup // k))):
            state, metrics = trainer.multi_train_step(state, *bk)
        float(metrics["T_total"][-1])
        t0 = time.perf_counter()
        for _ in range(dispatches):
            state, metrics = trainer.multi_train_step(state, *bk)
        float(metrics["T_total"][-1])
        dt = time.perf_counter() - t0
        metrics = {key: v[-1] for key, v in metrics.items()}
    else:
        b = trainer.put_batch(rand_clips(batch, d.num_past_frames),
                              rand_clips(batch, d.num_future_frames))
        n_steps = args.steps
        for _ in range(args.warmup):
            state, metrics = trainer.train_step(state, *b)
        float(metrics["T_total"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = trainer.train_step(state, *b)
        float(metrics["T_total"])
        dt = time.perf_counter() - t0

    steps_per_sec = n_steps / dt
    t = cfg.transformer
    if cfg.stage == "far":
        # frames processed by the transformer per step (teacher forcing:
        # Tp + Tf - 1 frames in, same count predicted)
        frames_per_step = batch * (d.num_past_frames + d.num_future_frames - 1)
        flops = transformer_step_flops(
            batch, d.num_past_frames + d.num_future_frames - 1,
            t.enc_h, t.enc_w, t.d_model, t.n_heads, t.num_encoder_layers,
            t.window_size, t.spatial_ffn_hidden_ratio, backward=True)
    else:
        # NAR predicts all Tf future frames in one shot
        frames_per_step = batch * d.num_future_frames
        flops = nar_step_flops(
            batch, d.num_past_frames, d.num_future_frames,
            t.enc_h, t.enc_w, t.d_model, t.n_heads, t.num_encoder_layers,
            t.num_decoder_layers, t.window_size,
            t.spatial_ffn_hidden_ratio, backward=True)
    frames_per_sec = steps_per_sec * frames_per_step
    achieved_tflops = flops * steps_per_sec / 1e12

    # analytic A100 baseline for the torch reference (see module docstring)
    a100_frames_per_sec = (312e12 * 0.40) / (flops / frames_per_step)

    # the honest engineering metric alongside vs_baseline — see
    # BENCH_NOTES.md "The throughput north star, resolved by arithmetic"
    composite_bound_ms = COMPOSITE_BOUND_MS.get(
        (args.preset, cfg.optim.mu_dtype))

    diag = {"steps_per_sec": round(steps_per_sec, 3),
            "transformer_tflops_per_step": round(flops / 1e12, 3),
            "achieved_tflops": round(achieved_tflops, 2),
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "batch": batch,
            "losses": {k: float(v) for k, v in metrics.items()}}
    if (composite_bound_ms and not args.quick
            and jax.default_backend() == "tpu"
            and batch == get_preset(args.preset).data.batch_size):
        diag["pct_of_composite_light"] = round(
            100 * composite_bound_ms * steps_per_sec / 1e3, 1)
    print(json.dumps(diag), file=sys.stderr)

    print(json.dumps({
        "metric": f"{cfg.name}_train_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(frames_per_sec / a100_frames_per_sec, 3),
    }))


if __name__ == "__main__":
    main()
