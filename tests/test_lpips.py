"""LPIPS numeric validation against a torch-side re-derivation.

The pretrained AlexNet weights cannot exist in this environment (zero
egress), so the MATH is validated instead: both sides get the SAME random
weights (via the .npz format scripts/export_lpips.py produces) and must
produce identical scores. Once a real weight export is dropped in, only the
file changes — every op in the metric is covered here.

The torch oracle re-derives the pip ``lpips`` package's forward pass inline
(reference: Test_VPTR.ipynb cell 9 uses lpips.LPIPS(net='alex')): scaling
layer -> AlexNet feature taps (convs 11/5/3/3/3, maxpool after taps 0 and 1)
-> channel unit-normalization -> squared diff -> 1x1 non-negative linear
head -> spatial mean -> sum over taps. No import from /root/reference.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vptr_tpu.eval.lpips import _ALEX_CFG, _SCALE, _SHIFT, LPIPS, load_weights

RNG = np.random.default_rng(55)


def _random_weights_npz(tmp_path):
    """Random weights in the export_lpips.py npz layout."""
    flat = {}
    in_ch = 3
    for i, (feat, k, _, _) in enumerate(_ALEX_CFG):
        flat[f"alex/conv{i}/kernel"] = (
            RNG.normal(size=(k, k, in_ch, feat)).astype(np.float32) * 0.05)
        flat[f"alex/conv{i}/bias"] = (
            RNG.normal(size=(feat,)).astype(np.float32) * 0.05)
        in_ch = feat
    for i, (feat, _, _, _) in enumerate(_ALEX_CFG):
        flat[f"lin{i}"] = np.abs(
            RNG.normal(size=(feat,)).astype(np.float32))
    path = tmp_path / "lpips_random.npz"
    np.savez(path, **flat)
    return str(path), flat


def _torch_lpips(img1, img2, flat):
    """Inline torch re-derivation of the lpips-package forward (NCHW)."""
    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)

    def prep(img):  # (N, H, W, C) in [0, 1] -> scaled NCHW
        t = torch.tensor(img).permute(0, 3, 1, 2)
        if t.shape[1] == 1:
            t = t.repeat(1, 3, 1, 1)    # gray -> RGB (notebook parity)
        t = t * 2.0 - 1.0
        return (t - shift) / scale

    def taps(x):
        outs = []
        for i, (_, k, s, p) in enumerate(_ALEX_CFG):
            w = torch.tensor(flat[f"alex/conv{i}/kernel"]).permute(3, 2, 0, 1)
            b = torch.tensor(flat[f"alex/conv{i}/bias"])
            x = F.relu(F.conv2d(x, w, b, stride=s, padding=p))
            outs.append(x)
            if i in (0, 1):
                x = F.max_pool2d(x, 3, stride=2)
        return outs

    def unit_norm(f):
        return f / torch.sqrt((f ** 2).sum(dim=1, keepdim=True) + 1e-10)

    t1, t2 = taps(prep(img1)), taps(prep(img2))
    total = 0.0
    for i, (f1, f2) in enumerate(zip(t1, t2)):
        diff = (unit_norm(f1) - unit_norm(f2)) ** 2
        w = torch.tensor(flat[f"lin{i}"]).abs().view(1, -1, 1, 1)
        total = total + (diff * w).sum(dim=1).mean(dim=(1, 2))
    return total.numpy()


@pytest.mark.parametrize("channels", [1, 3])
def test_lpips_matches_torch_rederivation(tmp_path, channels):
    path, flat = _random_weights_npz(tmp_path)
    params = load_weights(path)
    assert params is not None

    img1 = RNG.random((4, 64, 64, channels)).astype(np.float32)
    img2 = RNG.random((4, 64, 64, channels)).astype(np.float32)

    got = np.asarray(LPIPS().apply({"params": params}, img1, img2))
    want = _torch_lpips(img1, img2, flat)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_lpips_basic_properties(tmp_path):
    path, _ = _random_weights_npz(tmp_path)
    params = load_weights(path)
    img = RNG.random((2, 64, 64, 1)).astype(np.float32)
    same = np.asarray(LPIPS().apply({"params": params}, img, img))
    np.testing.assert_allclose(same, 0.0, atol=1e-6)
    other = RNG.random((2, 64, 64, 1)).astype(np.float32)
    diff = np.asarray(LPIPS().apply({"params": params}, img, other))
    assert (diff > 0).all()


def test_make_lpips_fn_returns_none_without_weights(tmp_path):
    from vptr_tpu.eval.lpips import make_lpips_fn

    assert make_lpips_fn(str(tmp_path / "missing.npz")) is None
