"""Bisect the fused_full composition crash (round 3).

The standalone LN-folded kernels compile and run on the chip
(tpu_probe_r03.py), but the full FAR train step with fused_full crashes the
remote Mosaic compile helper (HTTP 500). This script climbs the composition
ladder one rung at a time to find the first failing layer:

  ln_window_drop / ln_temporal_drop — standalone kernels WITH in-kernel
      dropout (the probes ran rate=0)
  block1_eval / block1_train — one EncoderBlock at the real geometry,
      fwd+bwd, without/with dropout+drop-path
  blockN_train — N stacked blocks

Each probe prints one JSON line; failures are caught and truncated.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _run(name, fn):
    import jax

    t0 = time.perf_counter()
    res = {"probe": name}
    try:
        out = fn()
        val = float(np.asarray(jax.device_get(out)).sum())
        res["ok"] = True
        res["value"] = round(val, 3)
        res["total_s"] = round(time.perf_counter() - t0, 1)
    except Exception as e:
        res["ok"] = False
        res["error"] = repr(e)[:600]
        res["total_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(res), flush=True)
    return res.get("ok", False)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--probes", nargs="*", default=[
        "ln_window_drop", "ln_temporal_drop", "block1_eval", "block1_train",
        "block2_train", "block6_train", "block12_train"])
    p.add_argument("--fwd-block", type=int, default=32)
    p.add_argument("--bwd-block", type=int, default=16)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from vptr_tpu.models.transformer import EncoderBlock
    from vptr_tpu.models.position import (
        position_embedding_1d,
        position_embedding_2d,
    )
    from vptr_tpu.ops.fused_window_attention import fused_attention_ln

    dt = jnp.bfloat16
    interp = jax.default_backend() != "tpu"
    heads, c = 8, 528
    rng = np.random.default_rng(0)

    def params():
        mk = lambda: jnp.asarray(
            rng.normal(size=(c, c)).astype(np.float32) * 0.05).astype(dt)
        vk = lambda: jnp.asarray(
            rng.normal(size=(c,)).astype(np.float32) * 0.05)
        return mk(), vk(), mk(), vk(), mk(), vk(), mk(), vk()

    ls = jnp.asarray(1 + 0.1 * rng.normal(size=(c,)).astype(np.float32))
    lb = jnp.asarray(0.1 * rng.normal(size=(c,)).astype(np.float32))
    causal19 = jnp.asarray(
        np.triu(np.full((19, 19), -1e30, np.float32), k=1))[None]

    if "ln_window_drop" in args.probes:
        x = jnp.asarray(rng.normal(size=(760, 16, c))
                        .astype(np.float32)).astype(dt)
        pos = jnp.asarray(rng.normal(size=(16, c)).astype(np.float32))
        pp = params()

        def f():
            def loss(x, *pp):
                return jnp.sum(fused_attention_ln(
                    x, *pp, ls, lb, pos, None, 7, heads, 0.1,
                    args.fwd_block, interp, args.bwd_block)
                    .astype(jnp.float32) ** 2)
            return jax.jit(jax.grad(loss))(x, *pp)

        _run("ln_window_drop", f)

    if "ln_temporal_drop" in args.probes:
        x = jnp.asarray(rng.normal(size=(640, 19, c))
                        .astype(np.float32)).astype(dt)
        pos = jnp.asarray(rng.normal(size=(19, c)).astype(np.float32))
        pp = params()

        def f():
            def loss(x, *pp):
                return jnp.sum(fused_attention_ln(
                    x, *pp, ls, lb, pos, causal19, 7, heads, 0.1,
                    args.fwd_block, interp, args.bwd_block)
                    .astype(jnp.float32) ** 2)
            return jax.jit(jax.grad(loss))(x, *pp)

        _run("ln_temporal_drop", f)

    # ---- EncoderBlock composition ladder at the real FAR geometry ----
    n, t, h, w = 10, 19, 8, 8
    x = jnp.asarray(rng.normal(size=(n, t, h, w, c))
                    .astype(np.float32)).astype(dt)
    pos2d = jnp.asarray(np.asarray(position_embedding_2d(4, 4, c),
                                   np.float32))
    pos_t = jnp.asarray(np.asarray(position_embedding_1d(t, c), np.float32))

    def block_probe(name, nblocks, train):
        blocks = [EncoderBlock(c, heads, window=4, dropout=0.1,
                               drop_path=0.1, dim_feedforward=4 * c,
                               far=True, fused_attention=True,
                               fused_full=True, dtype=dt, name=f"b{i}")
                  for i in range(nblocks)]
        import flax.linen as nn

        class Stack(nn.Module):
            @nn.compact
            def __call__(self, x, train=False, deterministic=True):
                for i in range(nblocks):
                    x = EncoderBlock(c, heads, window=4, dropout=0.1,
                                     drop_path=0.1, dim_feedforward=4 * c,
                                     far=True, fused_attention=True,
                                     fused_full=True, dtype=dt,
                                     name=f"b{i}")(
                        x, pos2d, pos_t, train=train,
                        deterministic=deterministic)
                return x

        model = Stack()
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, x)

        def f():
            def loss(v, x):
                out = model.apply(v, x, train=train,
                                  deterministic=not train,
                                  rngs={"dropout": jax.random.PRNGKey(2)}
                                  if train else None)
                return jnp.sum(out.astype(jnp.float32) ** 2)
            g = jax.jit(jax.grad(loss))(variables, x)
            return jax.tree_util.tree_leaves(g)[0]

        _run(name, f)

    for name, nb, train in (("block1_eval", 1, False),
                            ("block1_train", 1, True),
                            ("block2_train", 2, True),
                            ("block6_train", 6, True),
                            ("block12_train", 12, True)):
        if name in args.probes:
            block_probe(name, nb, train)


if __name__ == "__main__":
    main()
