"""Round-4 TPU probes: the RECTANGULAR (Lq != Lk) attention-core kernel at
the published nar_bair shapes, standalone on the chip BEFORE composing into
the full train step (CLAUDE.md Mosaic discipline).

Probes (one JSON line each; numerics vs the XLA oracle, then fwd / fwd+bwd
timings for kernel and oracle — timing fetches a dependent value since
block_until_ready does not synchronize on this platform):

  rect_encdec — NAR decoder enc-dec attention at BAIR geometry: per decoder
                layer q is (N*HW=1024, heads 8, Tf=10, 66), kv Tp=2.
  rect_tslma  — TSLMA windows at BAIR geometry: (N*nWin=64, 8, Tf*16=160, 66)
                queries over (.., Tp*16=32, ..) memory.
  rect_mnist_tslma — TSLMA at nar_mnist eval-time chaining shapes when
                Tp != Tf would occur (10 -> 20): (64, 8, 160, 66) over 160 is
                square and already covered; this probes (64, 8, 160, 66) over
                (64, 8, 96, 66) as a mid-size rectangle.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_probe_r04.py
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


SHAPES = {
    # name: (batch, heads, lq, lk, head_dim)
    "rect_encdec": (1024, 8, 10, 2, 66),
    "rect_tslma": (64, 8, 160, 32, 66),
    "rect_mid": (64, 8, 160, 96, 66),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--probes", nargs="*", default=list(SHAPES))
    p.add_argument("--block", type=int, default=128)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--dropout", type=float, default=0.0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from vptr_tpu.ops.attention_core import _reference_core, attention_core

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    interp = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)

    for name in args.probes:
        b, h, lq, lk, d = SHAPES[name]
        q = jnp.asarray(rng.normal(size=(b, h, lq, d))
                        .astype(np.float32)).astype(dt)
        k = jnp.asarray(rng.normal(size=(b, h, lk, d))
                        .astype(np.float32)).astype(dt)
        v = jnp.asarray(rng.normal(size=(b, h, lk, d))
                        .astype(np.float32)).astype(dt)

        def kern(q, k, v):
            return attention_core(q, k, v, None, 0, args.dropout,
                                  args.block, interp)

        def ref(q, k, v):
            return _reference_core(q, k, v, None)

        _probe(name, (q, k, v), kern, ref)


if __name__ == "__main__":
    main()
