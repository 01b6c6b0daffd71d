"""Per-sublayer timing of one VidHRFormer encoder block on the TPU.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/block_profile.py [--fused]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from vptr_tpu.models.layers import (
    LayerNormHWC,
    Mlp,
    MlpDWBN,
    TemporalAttention,
    WindowAttention,
)
from vptr_tpu.models.position import position_embedding_1d, position_embedding_2d
from vptr_tpu.models.transformer import EncoderBlock


def bench(name, fn, variables, *args, n=20):
    try:
        out = fn(variables, *args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(variables, *args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        print(f"{name:24s}: {(time.perf_counter()-t0)/n*1000:.2f} ms",
              flush=True)
    except Exception as e:
        print(f"{name:24s}: FAILED {repr(e)[:160]}", flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--fused", action="store_true")
    args = parser.parse_args()

    dtype = jnp.bfloat16
    d, heads, window = 528, 8, 4
    x = jnp.asarray(np.random.rand(10, 19, 8, 8, d), dtype)
    pos2d = position_embedding_2d(window, window, d)
    pos_t = position_embedding_1d(19, d)
    rng = jax.random.PRNGKey(0)

    block = EncoderBlock(d, heads, window, dropout=0.0, drop_path=0.0,
                         ffn_hidden_ratio=4, dim_feedforward=4 * d, far=True,
                         fused_attention=args.fused, dtype=dtype)
    bv = block.init(rng, x, pos2d, pos_t)
    bench("EncoderBlock fwd", jax.jit(
        lambda v, x: block.apply(v, x, pos2d, pos_t)), bv, x)

    wa = WindowAttention(d, heads, window, 0.0, fused=args.fused, dtype=dtype)
    wv = wa.init(rng, x, pos2d)
    bench("WindowAttention", jax.jit(
        lambda v, x: wa.apply(v, x, pos2d)), wv, x)

    ta = TemporalAttention(d, heads, 0.0, causal=True, fused=args.fused,
                           dtype=dtype)
    tv = ta.init(rng, x, pos_t)
    bench("TemporalAttention", jax.jit(
        lambda v, x: ta.apply(v, x, pos_t)), tv, x)

    for norm in ("layer", "batch"):
        m = MlpDWBN(d, 4 * d, norm=norm, dtype=dtype)
        mv = m.init(rng, x, train=(norm == "batch"))
        bench(f"MlpDWBN({norm})", jax.jit(
            lambda v, x, m=m: m.apply(v, x)), mv, x)

    mlp = Mlp(d, 4 * d, dtype=dtype)
    lv = mlp.init(rng, x)
    bench("Mlp (linear FFN)", jax.jit(lambda v, x: mlp.apply(v, x)), lv, x)

    ln = LayerNormHWC(dtype=dtype)
    h = jnp.asarray(np.random.rand(190, 8, 8, 4 * d), dtype)
    lnv = ln.init(rng, h)
    bench("LayerNormHWC(hidden)", jax.jit(lambda v, h: ln.apply(v, h)),
          lnv, h)

    # conv-FFN stage breakdown: is the depthwise 3x3 layout-bound?
    from flax import linen as nn

    hid = 4 * d
    x2 = jnp.asarray(np.random.rand(190, 8, 8, d), dtype)
    fc1 = nn.Conv(hid, (1, 1), dtype=dtype)
    v1 = fc1.init(rng, x2)
    bench("MlpDWBN/fc1 1x1", jax.jit(lambda v, x: fc1.apply(v, x)), v1, x2)
    dw = nn.Conv(hid, (3, 3), padding=1, feature_group_count=hid, dtype=dtype)
    vdw = dw.init(rng, h)
    bench("MlpDWBN/dw3x3", jax.jit(lambda v, x: dw.apply(v, x)), vdw, h)
    # layout probe (NOT semantically equivalent — padding crosses frame
    # boundaries): same element count with 19 frames stacked into H, to see
    # whether many tiny 8x8 images vs fewer taller ones changes throughput
    h_tall = h.reshape(10, 152, 8, hid)
    dw2 = nn.Conv(hid, (3, 3), padding=1, feature_group_count=hid,
                  dtype=dtype)
    vdw2 = dw2.init(rng, h_tall)
    bench("dw3x3 (folded 152x8)", jax.jit(lambda v, x: dw2.apply(v, x)),
          vdw2, h_tall)
    fc2 = nn.Conv(d, (1, 1), dtype=dtype)
    v2 = fc2.init(rng, h)
    bench("MlpDWBN/fc2 1x1", jax.jit(lambda v, x: fc2.apply(v, x)), v2, h)


if __name__ == "__main__":
    main()
