"""Per-sublayer timing of one VidHRFormer NAR DECODER block on the TPU
(round-4: the NAR-specific kernel round — the encoder block was profiled in
round 3, scripts/block_profile.py; the decoder's 6-sublayer structure
(reference: VidHRFormer_modules.py:164-211) had no per-sublayer numbers).

Geometry = nar_mnist parity recipe: batch 16, Tp = Tf = 10, 8x8x528 latents,
8 heads, window 4, RPE on. Prints fwd and fwd+bwd ms per sublayer and for
the whole block (standalone calls carry the ~2.5 ms relay dispatch floor —
the whole-block rows are the trustworthy absolute numbers, the sublayer rows
give the split).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/nar_block_profile.py --fused [--full]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from vptr_tpu.models.layers import Mlp, MlpDWBN, TemporalAttention, WindowAttention
from vptr_tpu.models.position import (
    position_embedding_1d,
    position_embedding_2d,
    position_embedding_3d,
)
from vptr_tpu.models.transformer import TSLMA, DecoderBlockNAR


REPS = 20


def bench(name, fn, variables, *args, n=None):
    n = REPS if n is None else n
    try:
        out = fn(variables, *args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(variables, *args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        print(f"{name:28s}: {(time.perf_counter()-t0)/n*1000:.2f} ms",
              flush=True)
    except Exception as e:
        print(f"{name:28s}: FAILED {repr(e)[:200]}", flush=True)


def bench_fb(name, apply_fn, variables, *args, n=None):
    """fwd+bwd: grad of sum-of-squares wrt params AND the first array arg."""

    def loss(v, *a):
        out = apply_fn(v, *a)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1)))
    bench(name + " fwd+bwd", g, variables, *args, n=n)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--fused", action="store_true")
    parser.add_argument("--full", action="store_true",
                        help="fused_full (projection-fused window sublayer)")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--dim", type=int, default=528)
    parser.add_argument("--reps", type=int, default=20,
                        help="timing iterations (lower for CPU smoke)")
    args = parser.parse_args()

    global REPS
    REPS = args.reps
    dtype = jnp.bfloat16
    d, heads, window = args.dim, 8, 4
    b, tp, tf = args.batch, 10, 10
    rng = jax.random.PRNGKey(0)

    tgt = jnp.asarray(np.random.rand(b, tf, 8, 8, d), dtype)
    qpos = jnp.asarray(np.random.rand(b, tf, 8, 8, d), dtype)
    memory = jnp.asarray(np.random.rand(b, tp, 8, 8, d), dtype)
    pos2d = position_embedding_2d(window, window, d)
    pos_t = position_embedding_1d(tp + tf, d)
    pos3d = position_embedding_3d(tp + tf, window, window, d)

    fused = dict(fused_attention=args.fused, fused_full=args.full)

    for tslma in (False, True):
        block = DecoderBlockNAR(d, heads, window, dropout=0.0, drop_path=0.0,
                                ffn_hidden_ratio=4, dim_feedforward=4 * d,
                                rpe=True, tslma=tslma, dtype=dtype, **fused)
        bargs = (tgt, qpos, memory, pos2d, pos_t[tp:], pos_t[:tp],
                 pos3d if tslma else None)
        bv = block.init(rng, *bargs)
        tag = "tslma" if tslma else "temporal-encdec"
        bench(f"DecoderBlockNAR({tag})", jax.jit(
            lambda v, t, *a: block.apply(v, t, *a)), bv, *bargs)
        bench_fb(f"DecoderBlockNAR({tag})", jax.jit(
            lambda v, t, *a: block.apply(v, t, *a)), bv, *bargs)

    # ---- sublayers at decoder shapes ------------------------------------
    wa = WindowAttention(d, heads, window, 0.0, rpe=True,
                         fused=args.fused, fused_full=args.full, dtype=dtype)
    wv = wa.init(rng, tgt + qpos, pos2d, value=tgt)
    bench("1 slmhsa (q!=v)", jax.jit(
        lambda v, x, q: wa.apply(v, x + q, pos2d, value=x)), wv, tgt, qpos)

    m = MlpDWBN(d, 4 * d, norm="layer", dtype=dtype)
    mv = m.init(rng, tgt)
    bench("2/6 MlpDWBN(layer)", jax.jit(lambda v, x: m.apply(v, x)), mv, tgt)

    ta = TemporalAttention(d, heads, 0.0, fused=args.fused, dtype=dtype)
    tv = ta.init(rng, tgt, pos_t[tp:])
    bench("3 temporal self (Tf)", jax.jit(
        lambda v, x: ta.apply(v, x, pos_t[tp:])), tv, tgt)

    mlp = Mlp(d, 4 * d, dtype=dtype)
    lv = mlp.init(rng, tgt)
    bench("4 Mlp (linear FFN)", jax.jit(lambda v, x: mlp.apply(v, x)),
          lv, tgt)

    ed = TemporalAttention(d, heads, 0.0, fused=args.fused, dtype=dtype)
    ev = ed.init(rng, tgt, pos_t[tp:], kv=memory, pos_k=pos_t[:tp])
    bench("5 enc-dec temporal (rect)", jax.jit(
        lambda v, x, mem: ed.apply(v, x, pos_t[tp:], kv=mem,
                                   pos_k=pos_t[:tp])), ev, tgt, memory)
    bench_fb("5 enc-dec temporal", jax.jit(
        lambda v, x, mem: ed.apply(v, x, pos_t[tp:], kv=mem,
                                   pos_k=pos_t[:tp])), ev, tgt, memory)

    ts = TSLMA(d, heads, window, 0.0, fused=args.fused, dtype=dtype)
    sv = ts.init(rng, memory, tgt, pos3d)
    bench("5' TSLMA (160q x 160kv)", jax.jit(
        lambda v, mem, x: ts.apply(v, mem, x, pos3d)), sv, memory, tgt)
    bench_fb("5' TSLMA", jax.jit(
        lambda v, mem, x: ts.apply(v, mem, x, pos3d)), sv, memory, tgt)


if __name__ == "__main__":
    main()
