"""Round-2 TPU sweep: FAR train-step time across attention paths, all under
the REFERENCE PARITY config (attention dropout 0.1 active in training).

Variants:
  unfused     — XLA einsum attention (round-1 parity baseline)
  core        — Pallas attention_core fwd+bwd, in-kernel dropout
  full        — fully-fused sublayer (projections in-kernel), in-kernel dropout
  core_nodrop / full_nodrop — dropout disabled (round-1 best-known compare)

Prints one JSON line per variant. Timing fetches a dependent loss value
(block_until_ready does not synchronize on the axon relay).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def run_variant(name: str, overrides: dict, batch: int, steps: int,
                warmup: int) -> dict:
    import jax

    from vptr_tpu.config import get_preset
    from vptr_tpu.train.trainer import Trainer

    from vptr_tpu.models import layers

    # measurement-only: double the fused-full kernel tiles (the 64 MB
    # scoped-VMEM budget makes room the old 16 MB default did not). The
    # module-level hook is the ONLY working override — assigning the class
    # attribute is a no-op (flax dataclass defaults bind at class creation).
    layers.FUSED_FULL_BLOCKS_OVERRIDE = (
        (64, 32) if name.endswith("_bigtile") else None)

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

    k = trainer.steps_per_dispatch if trainer.multi_train_step else 1
    if k > 1:
        bk = trainer.put_batch_stacked(
            np.stack([past] * k), np.stack([future] * k))
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
        steps = dispatches * k
    else:
        b = trainer.put_batch(past, future)
        t_compile = time.perf_counter()
        for _ in range(warmup):
            state, metrics = trainer.train_step(state, *b)
        loss0 = float(metrics["T_total"])
        compile_s = time.perf_counter() - t_compile

        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = trainer.train_step(state, *b)
        loss = float(metrics["T_total"])
        dt = time.perf_counter() - t0

    frames = batch * (d.num_past_frames + d.num_future_frames - 1)
    out = {"variant": name, "ms_per_step": round(1e3 * dt / steps, 2),
           "frames_per_sec": round(frames * steps / dt, 1),
           "compile_s": round(compile_s, 1),
           "loss_first": round(loss0, 4), "loss_last": round(loss, 4)}
    print(json.dumps(out), flush=True)
    return out


VARIANTS = {
    "unfused": {},
    "core": {"transformer": {"fused_attention": True}},
    "full": {"transformer": {"fused_attention": True, "fused_full": True}},
    "full_temporal": {"transformer": {"fused_attention": True,
                                      "fused_full": True,
                                      "fused_full_temporal": True}},
    "full_ffn": {"transformer": {"fused_attention": True,
                                 "fused_full": True, "fused_ffn": True}},
    "full_dw": {"transformer": {"fused_attention": True,
                                "fused_full": True, "fused_dw": True}},
    "full_bigtile": {"transformer": {"fused_attention": True,
                                     "fused_full": True}},
    "full_res": {"transformer": {"fused_attention": True,
                                 "fused_full": True,
                                 "fused_residual": True}},
    "full_dispatch": {"steps_per_dispatch": 8,
                      "transformer": {"fused_attention": True,
                                      "fused_full": True}},
    "full_res_dispatch": {"steps_per_dispatch": 8,
                          "transformer": {"fused_attention": True,
                                          "fused_full": True,
                                          "fused_residual": True}},
    "core_ffn": {"transformer": {"fused_attention": True,
                                 "fused_ffn": True}},
    "core_nodrop": {"transformer": {"fused_attention": True,
                                    "attention_dropout": 0.0}},
    "full_nodrop": {"transformer": {"fused_attention": True,
                                    "fused_full": True,
                                    "attention_dropout": 0.0}},
    "core_convffn": {"transformer": {"fused_attention": True,
                                     "fused_conv_ffn": True}},
    "full_convffn": {"transformer": {"fused_attention": True,
                                     "fused_full": True,
                                     "fused_conv_ffn": True}},
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variants", nargs="*", default=list(VARIANTS))
    p.add_argument("--batch", type=int, default=10)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    args = p.parse_args()

    for name in args.variants:
        try:
            run_variant(name, VARIANTS[name], args.batch, args.steps,
                        args.warmup)
        except Exception as e:  # keep sweeping; report the failure
            print(json.dumps({"variant": name, "error": repr(e)[:500]}),
                  flush=True)
            print(f"--- {name} failed ---", file=sys.stderr)


if __name__ == "__main__":
    main()
