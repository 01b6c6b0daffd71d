"""Export LPIPS (AlexNet) weights from the pip ``lpips`` package to the .npz
format consumed by vptr_tpu.eval.lpips.load_weights.

Run wherever ``pip install lpips`` is possible (this container has no
egress), then copy the .npz next to vptr_tpu/eval/lpips.py or point
VPTR_LPIPS_WEIGHTS at it:

    python scripts/export_lpips.py --out lpips_alex.npz

Layout: ``alex/conv{i}/kernel`` (HWIO), ``alex/conv{i}/bias``, ``lin{i}``
(per-tap channel weights, squeezed from the 1x1 conv heads).
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="lpips_alex.npz")
    args = parser.parse_args()

    import lpips  # pip package by R. Zhang (the reference notebook's dep)

    model = lpips.LPIPS(net="alex")
    flat = {}

    # torch AlexNet features: conv indices 0, 3, 6, 8, 10
    torch_convs = []
    for slice_name in ["slice1", "slice2", "slice3", "slice4", "slice5"]:
        sl = getattr(model.net, slice_name)
        for layer in sl:
            if layer.__class__.__name__ == "Conv2d":
                torch_convs.append(layer)
    assert len(torch_convs) == 5
    for i, conv in enumerate(torch_convs):
        w = conv.weight.detach().numpy()          # (out, in, kh, kw)
        flat[f"alex/conv{i}/kernel"] = w.transpose(2, 3, 1, 0)  # HWIO
        flat[f"alex/conv{i}/bias"] = conv.bias.detach().numpy()
    for i, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy() # (1, C, 1, 1)
        flat[f"lin{i}"] = w.reshape(-1)

    np.savez(args.out, **flat)
    print(f"wrote {args.out} with {len(flat)} arrays")


if __name__ == "__main__":
    main()
