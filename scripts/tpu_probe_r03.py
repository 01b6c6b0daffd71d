"""Round-3 TPU probes: validate + time the new kernel paths standalone on
the chip BEFORE composing them into the full train step (CLAUDE.md Mosaic
discipline).

Probes (each prints one JSON line):
  pad_temporal   — fused_attention at the FAR temporal shape (640, 19, 528)
                   with a causal bias: in-kernel token padding 19 -> 32.
  ln_window      — fused_attention_ln at the window shape (760, 16, 528)
                   with a (16, 528) pos table (encoder WindowAttention).
  ln_temporal    — fused_attention_ln at (640, 19, 528), causal + pos,
                   padded in-kernel.
Each probe checks numerics vs the XLA oracle (dropout off), then times
fwd and fwd+bwd for both the kernel and the oracle. Timing fetches a
dependent value (block_until_ready does not synchronize here).

Usage: python scripts/tpu_probe_r03.py [--probes pad_temporal ln_window ...]
       [--fwd-block 32] [--bwd-block 16]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _time(fn, steps=10):
    import jax

    out = fn()
    jax.block_until_ready(out)
    float(jax.numpy.sum(out[0] if isinstance(out, tuple) else out))  # sync
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn()
    float(jax.numpy.sum(out[0] if isinstance(out, tuple) else out))
    return 1e3 * (time.perf_counter() - t0) / steps


def _probe(name, args, make_kernel, make_ref):
    import jax
    import jax.numpy as jnp

    res = {"probe": name}
    try:
        kern = jax.jit(make_kernel)
        ref = jax.jit(make_ref)
        got, want = kern(*args), ref(*args)
        diff = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                     - want.astype(jnp.float32))))
        res["fwd_max_diff"] = round(diff, 6)
        res["fwd_ms"] = round(_time(lambda: kern(*args)), 3)
        res["fwd_ms_xla"] = round(_time(lambda: ref(*args)), 3)

        def loss(f):
            return lambda *a: jnp.sum(f(*a).astype(jnp.float32) ** 2)

        n = len(args)
        gkern = jax.jit(jax.grad(loss(make_kernel), argnums=tuple(range(n))))
        gref = jax.jit(jax.grad(loss(make_ref), argnums=tuple(range(n))))
        gk, gr = gkern(*args), gref(*args)
        gd = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                       - b.astype(jnp.float32))))
                 for a, b in zip(gk, gr))
        res["bwd_max_diff"] = round(gd, 5)
        res["fwdbwd_ms"] = round(_time(lambda: gkern(*args)), 3)
        res["fwdbwd_ms_xla"] = round(_time(lambda: gref(*args)), 3)
    except Exception as e:
        res["error"] = repr(e)[:400]
    print(json.dumps(res), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--probes", nargs="*",
                   default=["pad_temporal", "ln_window", "ln_temporal",
                            "ffn"])
    p.add_argument("--fwd-block", type=int, default=32)
    p.add_argument("--bwd-block", type=int, default=16)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from vptr_tpu.ops.fused_window_attention import (
        _reference_attention,
        _reference_attention_ln,
        fused_attention,
        fused_attention_ln,
    )

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    interp = jax.default_backend() != "tpu"
    heads, c = 8, 528
    rng = np.random.default_rng(0)

    def params():
        mk = lambda: jnp.asarray(
            rng.normal(size=(c, c)).astype(np.float32) * 0.05).astype(dt)
        vk = lambda: jnp.asarray(
            rng.normal(size=(c,)).astype(np.float32) * 0.05)
        return mk(), vk(), mk(), vk(), mk(), vk(), mk(), vk()

    causal19 = jnp.asarray(
        np.triu(np.full((19, 19), -1e30, np.float32), k=1))[None]

    if "pad_temporal" in args.probes:
        x_qk = jnp.asarray(rng.normal(size=(640, 19, c))
                           .astype(np.float32)).astype(dt)
        x_v = jnp.asarray(rng.normal(size=(640, 19, c))
                          .astype(np.float32)).astype(dt)
        pp = params()

        def kern(x_qk, x_v, *pp):
            return fused_attention(x_qk, x_v, *pp, causal19, 0, heads, 0.0,
                                   args.fwd_block, interp, args.bwd_block)

        def ref(x_qk, x_v, *pp):
            return _reference_attention(
                x_qk, x_v, *pp,
                jnp.broadcast_to(causal19, (heads, 19, 19)), heads)

        _probe("pad_temporal", (x_qk, x_v) + pp, kern, ref)

    if "ln_window" in args.probes:
        x = jnp.asarray(rng.normal(size=(760, 16, c))
                        .astype(np.float32)).astype(dt)
        pos = jnp.asarray(rng.normal(size=(16, c)).astype(np.float32))
        ls = jnp.asarray(1 + 0.1 * rng.normal(size=(c,)).astype(np.float32))
        lb = jnp.asarray(0.1 * rng.normal(size=(c,)).astype(np.float32))
        pp = params()

        def kern(x, ls, lb, *pp):
            return fused_attention_ln(x, *pp, ls, lb, pos, None, 0, heads,
                                      0.0, args.fwd_block, interp,
                                      args.bwd_block)

        def ref(x, ls, lb, *pp):
            return _reference_attention_ln(x, *pp, ls, lb, pos, None, heads)

        _probe("ln_window", (x, ls, lb) + pp, kern, ref)

    if "ln_window_res" in args.probes:
        # residual-folded sublayer kernel vs (LN kernel + XLA residual add):
        # numerics should match ~exactly; the timing columns compare the
        # in-kernel residual against the XLA-side x + y at the window shape
        from vptr_tpu.ops.fused_window_attention import fused_attention_ln_res

        x = jnp.asarray(rng.normal(size=(760, 16, c))
                        .astype(np.float32)).astype(dt)
        pos = jnp.asarray(rng.normal(size=(16, c)).astype(np.float32))
        ls = jnp.asarray(1 + 0.1 * rng.normal(size=(c,)).astype(np.float32))
        lb = jnp.asarray(0.1 * rng.normal(size=(c,)).astype(np.float32))
        pp = params()

        def kern(x, ls, lb, *pp):
            return fused_attention_ln_res(x, *pp, ls, lb, pos, None, None,
                                          0, heads, 0.0, args.fwd_block,
                                          interp, args.bwd_block)

        def ref(x, ls, lb, *pp):
            y = fused_attention_ln(x, *pp, ls, lb, pos, None, 0, heads,
                                   0.0, args.fwd_block, interp,
                                   args.bwd_block)
            return (x.astype(jnp.float32)
                    + y.astype(jnp.float32)).astype(x.dtype)

        _probe("ln_window_res", (x, ls, lb) + pp, kern, ref)

    if "ln_temporal" in args.probes:
        x = jnp.asarray(rng.normal(size=(640, 19, c))
                        .astype(np.float32)).astype(dt)
        pos = jnp.asarray(rng.normal(size=(19, c)).astype(np.float32))
        ls = jnp.asarray(1 + 0.1 * rng.normal(size=(c,)).astype(np.float32))
        lb = jnp.asarray(0.1 * rng.normal(size=(c,)).astype(np.float32))
        pp = params()

        def kern(x, ls, lb, *pp):
            return fused_attention_ln(x, *pp, ls, lb, pos, causal19, 0,
                                      heads, 0.0, args.fwd_block, interp,
                                      args.bwd_block)

        def ref(x, ls, lb, *pp):
            return _reference_attention_ln(
                x, *pp, ls, lb, pos,
                jnp.broadcast_to(causal19, (heads, 19, 19)), heads)

        _probe("ln_temporal", (x, ls, lb) + pp, kern, ref)

    if "ffn" in args.probes:
        from vptr_tpu.ops.fused_ffn import _reference_ffn, fused_ffn

        s, hidden = 12160, 4 * c
        x = jnp.asarray(rng.normal(size=(s, c))
                        .astype(np.float32)).astype(dt)
        w1 = jnp.asarray(rng.normal(size=(c, hidden))
                         .astype(np.float32) * 0.05).astype(dt)
        b1 = jnp.asarray(rng.normal(size=(hidden,)).astype(np.float32) * .05)
        w2 = jnp.asarray(rng.normal(size=(hidden, c))
                         .astype(np.float32) * 0.05).astype(dt)
        b2 = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.05)
        ls = jnp.asarray(1 + 0.1 * rng.normal(size=(c,)).astype(np.float32))
        lb = jnp.asarray(0.1 * rng.normal(size=(c,)).astype(np.float32))

        def kern(x, w1, b1, w2, b2, ls, lb):
            return fused_ffn(x, w1, b1, w2, b2, ls, lb, 7, 0.1,
                             256, interp, 128)

        def ref(x, w1, b1, w2, b2, ls, lb):
            from vptr_tpu.ops.fused_ffn import ffn_keep_mask

            keep = ffn_keep_mask(7, x.shape[0], hidden, 0.1)
            return _reference_ffn(x, w1, b1, w2, b2, ls, lb,
                                  keep=keep, rate=0.1)

        _probe("ffn", (x, w1, b1, w2, b2, ls, lb), kern, ref)

    if "dw" in args.probes:
        from vptr_tpu.ops.fused_dw_chain import (
            _reference_dw_chain,
            dw_keep_mask,
            fused_dw_chain,
        )

        n, hw, hidden, w = 190, 64, 4 * c, 8
        x = jnp.asarray(rng.normal(size=(n, hw, hidden))
                        .astype(np.float32)).astype(dt)
        taps = jnp.asarray(rng.normal(size=(9, hidden))
                           .astype(np.float32) * 0.2)
        dwb = jnp.asarray(rng.normal(size=(hidden,)).astype(np.float32) * .05)
        mk_aff = lambda off: jnp.asarray(
            off + 0.1 * rng.normal(size=(hw, hidden)).astype(np.float32))
        s1, b1, s2, b2 = mk_aff(1), mk_aff(0), mk_aff(1), mk_aff(0)

        def kern(x, taps, dwb, s1, b1, s2, b2):
            return fused_dw_chain(x, taps, dwb, s1, b1, s2, b2, 7, w,
                                  0.1, 8, interp)

        def ref(x, taps, dwb, s1, b1, s2, b2):
            keep = dw_keep_mask(7, n, hw, hidden, 0.1)
            return _reference_dw_chain(x, taps, dwb, s1, b1, s2, b2, w=w,
                                       keep=keep, rate=0.1)

        _probe("dw", (x, taps, dwb, s1, b1, s2, b2), kern, ref)


if __name__ == "__main__":
    main()
