"""Composite speed-of-light bound for the full train step (FAR and NAR).

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

No device needed — pure arithmetic over the parity shapes. Pass
--measured-step-ms (bench.py's 1000/steps_per_sec) to print the fraction
of composite speed-of-light actually achieved.

    python scripts/composite_roofline.py --measured-step-ms 162.2
    python scripts/composite_roofline.py --preset nar_mnist --measured-step-ms 198.7
"""

from __future__ import annotations

import argparse
import json

CEIL_SHAPE_TFLOPS = 60.0   # measured GEMM ceiling at the model's shapes
CEIL_CONV_TFLOPS = 150.0   # measured big-GEMM ceiling (convs tile there)
CEIL_GBS = 187.0           # measured HBM bandwidth on this tunneled chip
EL = 2                     # bf16 bytes

# exact trainable-param counts from initializing the parity geometries
# (jax.eval_shape over build_transformer(get_preset(name)).init, the NAR
# ones via init_all so the trained NCE projector's 558,624 params are
# counted — the round-3 number 117,809,952 missed it); matches the AdamW
# traffic that phase_roofline measures — per-block arithmetic undercounts
# biases, norms, queries, the NCE head. nar_bair == nar_mnist: Tp/Tf only
# change activation shapes, frame_queries are Tf-bound and Tf=10 in both.
N_PARAMS = {"far_mnist": 88_008_096, "nar_mnist": 118_368_576,
            "nar_bair": 118_368_576}


def lower_bound_ms(flops: float, bytes_: float, tflops=None):
    # late-bound so the --ceil-* overrides (set in main) take effect
    if tflops is None:
        tflops = CEIL_SHAPE_TFLOPS
    return max(flops / (tflops * 1e12), bytes_ / (CEIL_GBS * 1e9)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="far_mnist",
                    choices=["far_mnist", "nar_mnist", "nar_bair"])
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--measured-step-ms", type=float, default=None)
    ap.add_argument("--ceil-shape-tflops", type=float, default=None,
                    help="override the model-shape GEMM ceiling (default: "
                    "60, measured on this tunneled chip). For a spec-sheet "
                    "v5e estimate scale by peak: 60 * 197/150 ~= 79")
    ap.add_argument("--ceil-conv-tflops", type=float, default=None,
                    help="override the big-GEMM/conv ceiling (default 150 "
                    "measured; v5e spec peak 197)")
    ap.add_argument("--ceil-gbs", type=float, default=None,
                    help="override HBM bandwidth (default 187 measured on "
                    "this virtualized part; v5e spec 820)")
    ap.add_argument("--mu-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="dtype of Adam's first moment (optim.mu_dtype): "
                    "bfloat16 shrinks the update's 7-word/param traffic to "
                    "6 f32-equivalent words (mu read+write at 2 bytes)")
    args = ap.parse_args()

    global CEIL_SHAPE_TFLOPS, CEIL_CONV_TFLOPS, CEIL_GBS
    if args.ceil_shape_tflops:
        CEIL_SHAPE_TFLOPS = args.ceil_shape_tflops
    if args.ceil_conv_tflops:
        CEIL_CONV_TFLOPS = args.ceil_conv_tflops
    if args.ceil_gbs:
        CEIL_GBS = args.ceil_gbs

    from vptr_tpu.config import get_preset
    cfg = get_preset(args.preset)
    if args.batch is not None:
        cfg = cfg.override({"data": {"batch_size": args.batch}})
    d, t = cfg.data, cfg.transformer
    B = d.batch_size
    Tp, Tf = d.num_past_frames, d.num_future_frames
    H, W, C = t.enc_h, t.enc_w, t.d_model
    Hd = t.spatial_ffn_hidden_ratio * C
    win = t.window_size

    rows, total = [], 0.0

    def phase(name, ms):
        nonlocal total
        rows.append({"phase": name, "min_ms": round(ms, 2)})
        total += ms

    # ---- sublayer lower bounds (N tokens) -------------------------------
    def attn_ms(n_tokens, seq_len):
        """LN + q/k/v/out projections + scores over seq_len-token groups,
        reading/writing the (N, C) activations once each."""
        flops = 4 * 2 * n_tokens * C * C + 2 * 2 * n_tokens * seq_len * C
        return lower_bound_ms(flops, 2 * n_tokens * C * EL)

    def conv_ffn_ms(n_tokens):
        fc = lower_bound_ms(2 * n_tokens * C * Hd,
                            (n_tokens * C + n_tokens * Hd) * EL)
        dw = lower_bound_ms(2 * 9 * n_tokens * Hd, 2 * n_tokens * Hd * EL)
        return 2 * fc + dw

    def lin_ffn_ms(n_tokens):
        return 2 * lower_bound_ms(2 * n_tokens * C * Hd,
                                  (n_tokens * C + n_tokens * Hd) * EL)

    if args.preset == "far_mnist":
        T = Tp + Tf - 1                     # teacher forcing
        N = B * T * H * W
        block_fwd = (attn_ms(N, win * win) + attn_ms(N, T)
                     + conv_ffn_ms(N) + lin_ffn_ms(N))
        phase("transformer_fwd", t.num_encoder_layers * block_fwd)
        phase("transformer_bwd", 2 * t.num_encoder_layers * block_fwd)
        frames_enc, frames_dec = B * T, B * T
    else:
        # NAR: encoder over past tokens; decoder blocks are 6 sublayers
        # (window self-attn, conv FFN, temporal self-attn over Tf, linear
        # FFN, enc-dec attention over Tp memory, second conv FFN); plus
        # two NCE projections (train_NAR.py:81-82)
        Ne, Nd = B * Tp * H * W, B * Tf * H * W
        enc_fwd = (attn_ms(Ne, win * win) + attn_ms(Ne, Tp)
                   + conv_ffn_ms(Ne) + lin_ffn_ms(Ne))
        dec_fwd = (attn_ms(Nd, win * win) + conv_ffn_ms(Nd)
                   + attn_ms(Nd, Tf) + lin_ffn_ms(Nd)
                   + attn_ms(Nd, Tp) + conv_ffn_ms(Nd))
        nce_fwd = 2 * lower_bound_ms(2 * Nd * C * C, 2 * Nd * C * EL)
        fwd = (t.num_encoder_layers * enc_fwd
               + t.num_decoder_layers * dec_fwd + nce_fwd)
        phase("transformer_fwd", fwd)
        phase("transformer_bwd", 2 * fwd)
        frames_enc = B * (Tp + Tf)          # GT future encoded for NCE
        frames_dec = B * Tf

    # ---- frozen conv encode / decode (phase_roofline's conv model) -----
    def conv_flops(h, w, cin, cout, k):
        return 2 * h * w * cin * cout * k * k
    ngf, fd = cfg.ae.ngf, cfg.ae.feat_dim
    ch = cfg.ae.img_channels
    enc_f = (conv_flops(64, 64, ch, ngf, 7)
             + conv_flops(32, 32, ngf, 2 * ngf, 3)
             + conv_flops(16, 16, 2 * ngf, 4 * ngf, 3)
             + conv_flops(8, 8, 4 * ngf, fd, 3)
             + cfg.ae.n_res_blocks * 2 * conv_flops(8, 8, fd, fd, 3))
    dec_f = (conv_flops(16, 16, fd, 4 * ngf // 2 * 2, 3)
             + conv_flops(32, 32, 4 * ngf // 2, ngf, 3) * 2
             + conv_flops(64, 64, ngf, ch, 7))
    # activation traffic: dominated by the full-res stem/head planes
    enc_bytes = frames_enc * (64 * 64 * (ch + ngf) + 32 * 32 * 2 * ngf
                              + 16 * 16 * 4 * ngf + 8 * 8 * fd * 2) * EL
    dec_bytes = frames_dec * (8 * 8 * fd + 16 * 16 * 2 * ngf
                              + 32 * 32 * ngf + 64 * 64 * (ngf + ch)) * EL
    phase("conv_encode_fwd",
          lower_bound_ms(frames_enc * enc_f, enc_bytes, CEIL_CONV_TFLOPS))
    phase("decode_fwd+grad_through",
          lower_bound_ms(3 * frames_dec * dec_f, 3 * dec_bytes,
                         CEIL_CONV_TFLOPS))

    # ---- losses + optimizer --------------------------------------------
    frame_bytes = 2 * frames_dec * 64 * 64 * ch * EL
    phase("losses", lower_bound_ms(0, 2 * frame_bytes))
    # AdamW traffic: read p, g, mu, nu; write p, mu, nu. p/g/nu are f32
    # (5 touches x 4 bytes); mu is touched twice at its own width.
    mu_bytes = 2 if args.mu_dtype == "bfloat16" else 4
    phase("adamw_update",
          lower_bound_ms(0, (5 * 4 + 2 * mu_bytes) * N_PARAMS[args.preset]))

    for r in rows:
        print(json.dumps(r))
    out = {"preset": args.preset,
           "composite_step_lower_bound_ms": round(total, 2),
           "ceilings": {"shape_tflops": CEIL_SHAPE_TFLOPS,
                        "conv_tflops": CEIL_CONV_TFLOPS,
                        "hbm_gbs": CEIL_GBS, "mu_dtype": args.mu_dtype},
           "assumptions": "ideal fusion; norms/residuals free; bwd=2x fwd"}
    if args.measured_step_ms:
        out["measured_step_ms"] = args.measured_step_ms
        out["pct_of_composite_light"] = round(
            100 * total / args.measured_step_ms, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
