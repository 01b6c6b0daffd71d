"""Composite speed-of-light bound for the full FAR train step.

The per-phase roofline (scripts/phase_roofline.py) times phases in
ISOLATION, so their sum (~270 ms) overstates the step (~160 ms) and the
"% of GEMM ceiling" fractions understate how close the implementation is
to what this chip can physically do: the step also contains
bandwidth-bound work (depthwise convs, optimizer, attention traffic) that
no GEMM ceiling describes.

This script computes an ANALYTIC lower bound for the whole step under an
ideal-fusion execution model, one `max(flops/ceiling, bytes/bandwidth)`
term per fusible unit:

  - every GEMM runs at the measured shape ceiling (60 TF/s at the model's
    GEMM shapes; convs at the 150 TF/s big-GEMM ceiling — measured conv
    phases exceed the shape probe);
  - LayerNorms, residual adds, dropout, GELU are FREE (perfectly fused
    into neighbors — more generous than XLA, which is the point of a
    bound);
  - each attention/FFN sublayer reads its (N, C) input once and writes
    its output once; FFN hidden activations round-trip HBM only at the
    dw3x3 conv boundary (GEMM->conv cannot stay in registers);
  - backward = 2x forward in both FLOPs and bytes (dx + dW each roughly
    re-run the forward's GEMMs; activation re-reads ~match);
  - AdamW traffic = 7 f32 words/param (read p, g, mu, nu; write p, mu,
    nu).

No device needed — pure arithmetic over the far_mnist parity shapes.
Pass --measured-step-ms (bench.py's 1000/steps_per_sec) to print the
fraction of composite speed-of-light actually achieved.

    python scripts/composite_roofline.py --measured-step-ms 162
"""

from __future__ import annotations

import argparse
import json

CEIL_SHAPE_TFLOPS = 60.0   # measured GEMM ceiling at the model's shapes
CEIL_CONV_TFLOPS = 150.0   # measured big-GEMM ceiling (convs tile there)
CEIL_GBS = 187.0           # measured HBM bandwidth on this tunneled chip
EL = 2                     # bf16 bytes


def lower_bound_ms(flops: float, bytes_: float, tflops=CEIL_SHAPE_TFLOPS):
    return max(flops / (tflops * 1e12), bytes_ / (CEIL_GBS * 1e9)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--measured-step-ms", type=float, default=None)
    args = ap.parse_args()

    from vptr_tpu.config import get_preset
    cfg = get_preset("far_mnist").override({"data": {"batch_size": args.batch}})
    d, t = cfg.data, cfg.transformer
    B = d.batch_size
    T = d.num_past_frames + d.num_future_frames - 1   # teacher forcing
    H, W, C = t.enc_h, t.enc_w, t.d_model
    Hd = t.spatial_ffn_hidden_ratio * C
    L = t.num_encoder_layers
    win = t.window_size
    N = B * T * H * W                                  # tokens

    rows, total = [], 0.0

    def phase(name, ms):
        nonlocal total
        rows.append({"phase": name, "min_ms": round(ms, 2)})
        total += ms

    # ---- transformer block, forward ------------------------------------
    io_bytes = 2 * N * C * EL                  # sublayer reads x, writes y
    proj_flops = 4 * 2 * N * C * C             # q,k,v,out projections

    # window attention: scores over win^2-token windows
    wa_flops = proj_flops + 2 * 2 * N * (win * win) * C
    wa = lower_bound_ms(wa_flops, io_bytes)
    # temporal attention: scores over T-token sequences
    ta_flops = proj_flops + 2 * 2 * N * T * C
    ta = lower_bound_ms(ta_flops, io_bytes)
    # conv FFN: fc1 GEMM, dw3x3 (bandwidth: hidden round-trips at the
    # GEMM->conv boundary), fc2 GEMM
    fc = lower_bound_ms(2 * N * C * Hd, (N * C + N * Hd) * EL)
    dw = lower_bound_ms(2 * 9 * N * Hd, 2 * N * Hd * EL)
    conv_ffn = 2 * fc + dw
    # linear FFN: two GEMMs, hidden stays fused with GELU
    lin_ffn = 2 * fc

    block_fwd = wa + ta + conv_ffn + lin_ffn
    phase("transformer_fwd", L * block_fwd)
    phase("transformer_bwd", 2 * L * block_fwd)

    # ---- frozen conv encode / decode (phase_roofline's conv model) -----
    def conv_flops(h, w, cin, cout, k):
        return 2 * h * w * cin * cout * k * k
    ngf, fd = cfg.ae.ngf, cfg.ae.feat_dim
    enc_f = (conv_flops(64, 64, 1, ngf, 7)
             + conv_flops(32, 32, ngf, 2 * ngf, 3)
             + conv_flops(16, 16, 2 * ngf, 4 * ngf, 3)
             + conv_flops(8, 8, 4 * ngf, fd, 3)
             + cfg.ae.n_res_blocks * 2 * conv_flops(8, 8, fd, fd, 3))
    dec_f = (conv_flops(16, 16, fd, 4 * ngf // 2 * 2, 3)
             + conv_flops(32, 32, 4 * ngf // 2, ngf, 3) * 2
             + conv_flops(64, 64, ngf, 1, 7))
    # activation traffic: dominated by the full-res stem/head planes
    enc_bytes = B * T * (64 * 64 * (1 + ngf) + 32 * 32 * 2 * ngf
                         + 16 * 16 * 4 * ngf + 8 * 8 * fd * 2) * EL
    dec_bytes = B * T * (8 * 8 * fd + 16 * 16 * 2 * ngf
                         + 32 * 32 * ngf + 64 * 64 * (ngf + 1)) * EL
    phase("conv_encode_fwd",
          lower_bound_ms(B * T * enc_f, enc_bytes, CEIL_CONV_TFLOPS))
    phase("decode_fwd+grad_through",
          lower_bound_ms(3 * B * T * dec_f, 3 * dec_bytes, CEIL_CONV_TFLOPS))

    # ---- losses + optimizer --------------------------------------------
    frame_bytes = 2 * B * T * 64 * 64 * EL
    phase("losses_mse_gdl", lower_bound_ms(0, 2 * frame_bytes))

    # transformer trainable params: exact count from initializing the FAR
    # parity geometry (build_transformer(get_preset("far_mnist")) — matches
    # the AdamW traffic phase_roofline measures). Per-block arithmetic
    # undercounts (second attention sublayer, biases, norms, queries).
    n_params = 88_008_096
    phase("adamw_update", lower_bound_ms(0, 7 * n_params * 4))

    for r in rows:
        print(json.dumps(r))
    out = {"composite_step_lower_bound_ms": round(total, 2),
           "tokens": N, "layers": L,
           "assumptions": "ideal fusion; norms/residuals free; bwd=2x fwd"}
    if args.measured_step_ms:
        out["measured_step_ms"] = args.measured_step_ms
        out["pct_of_composite_light"] = round(
            100 * total / args.measured_step_ms, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
