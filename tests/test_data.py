"""Data pipeline: loader invariants, sharding, transforms, synthetic data."""

import numpy as np

from vptr_tpu.config import DataConfig
from vptr_tpu.data.datasets import SyntheticMovingMNIST, chop_clips
from vptr_tpu.data.loader import ClipLoader, build_dataset, build_loader
from vptr_tpu.data.transforms import (
    ClipTransform,
    Normalize,
    ReNormalize,
    center_crop,
    random_flip,
)


def test_synthetic_dataset_shapes_and_determinism():
    ds = SyntheticMovingMNIST(num_clips=8, num_past=3, num_future=4, size=64)
    past, future = ds.get(0)
    assert past.shape == (3, 64, 64, 1)
    assert future.shape == (4, 64, 64, 1)
    assert 0.0 <= past.min() and past.max() <= 1.0
    assert past.max() > 0.3  # digits actually rendered
    p2, f2 = ds.get(0)
    np.testing.assert_array_equal(past, p2)  # deterministic per index
    p3, _ = ds.get(1)
    assert np.abs(past - p3).max() > 0.1     # distinct clips


def test_loader_batching_and_epochs():
    ds = SyntheticMovingMNIST(num_clips=10, num_past=2, num_future=2, size=32)
    loader = ClipLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                        seed=0, prefetch=2)
    batches = list(loader)
    assert len(batches) == 2  # 10 // 4
    past, future = batches[0]
    assert past.shape == (4, 2, 32, 32, 1)
    # next epoch reshuffles
    batches2 = list(loader)
    assert len(batches2) == 2
    assert np.abs(batches[0][0] - batches2[0][0]).max() > 0


def test_loader_host_sharding_partitions_data():
    """Two hosts see disjoint shards covering the dataset — the
    DistributedSampler equivalent (reference: utils/dataset.py:71-77)."""
    ds = SyntheticMovingMNIST(num_clips=8, num_past=1, num_future=1, size=16)
    seen = []
    for host in range(2):
        loader = ClipLoader(ds, batch_size=2, shuffle=False, drop_last=True,
                            host_id=host, num_hosts=2, prefetch=0)
        assert len(loader) == 2  # 8 clips / 2 hosts / batch 2
        for past, _ in loader:
            seen.append(past)
    total = np.concatenate(seen, axis=0)
    assert total.shape[0] == 8


def test_normalize_renormalize_roundtrip():
    norm = Normalize(mean=(0.5, 0.4, 0.3), std=(2.0, 2.1, 1.9))
    renorm = ReNormalize(mean=(0.5, 0.4, 0.3), std=(2.0, 2.1, 1.9))
    clip = np.random.default_rng(0).uniform(size=(3, 8, 8, 3)).astype(np.float32)
    back = renorm(norm(clip))
    np.testing.assert_allclose(back, clip, atol=1e-6)


def test_clip_flip_is_per_clip_not_per_frame():
    clip = np.random.default_rng(1).uniform(size=(4, 8, 8, 1)).astype(np.float32)
    rng = np.random.default_rng(2)
    out = random_flip(clip, rng, p_horizontal=1.0, p_vertical=0.0)
    np.testing.assert_array_equal(out, clip[:, :, ::-1, :])


def test_center_crop():
    clip = np.arange(2 * 6 * 6 * 1, dtype=np.float32).reshape(2, 6, 6, 1)
    out = center_crop(clip, (4, 4))
    np.testing.assert_array_equal(out, clip[:, 1:5, 1:5, :])


def test_chop_clips_centering(tmp_path):
    """Clip chopping keeps the centered range (reference:
    utils/dataset.py:138-148): 11 frames, clip_length 4 -> 2 clips
    starting at frame rem//2 = 1."""
    from PIL import Image

    folder = tmp_path / "vid"
    folder.mkdir()
    for i in range(11):
        Image.new("L", (4, 4), i).save(folder / f"{i:04d}.png")
    clips = chop_clips(folder, 4)
    assert len(clips) == 2
    assert clips[0][0].name == "0001.png"
    assert clips[1][-1].name == "0008.png"


def test_build_dataset_synthetic_fallback():
    cfg = DataConfig(dataset="mnist", data_dir="/nonexistent/path")
    ds = build_dataset(cfg, split="train")
    assert isinstance(ds, SyntheticMovingMNIST)
    loader = build_loader(cfg, split="val")
    past, future = next(iter(loader))
    assert past.shape[1:] == (10, 64, 64, 1)


def test_synthetic_fallback_honors_dataset_transform_recipe():
    """The synthetic stand-in must apply the NAMED dataset's augmentation
    recipe: BAIR's transform is ToTensor+Normalize only — never flips
    (reference: utils/dataset.py:52-55) — while MNIST/KTH train transforms
    flip (utils/dataset.py:25,38). A surrogate 'bair' run training with
    flips would claim fidelity to a recipe it does not follow."""
    for name, want_flips in [("bair", False), ("mnist", True),
                             ("kth", True), ("synthetic", True)]:
        cfg = DataConfig(dataset=name, data_dir="/nonexistent/path")
        ds = build_dataset(cfg, split="train")
        assert isinstance(ds, SyntheticMovingMNIST)
        assert ds.transform.flips is want_flips, (name, ds.transform.flips)
        # eval splits never flip, for any dataset
        assert build_dataset(cfg, split="val").transform.flips is False


# ---------------------------------------------------------------------------
# person-run filter + clip video export (reference: pre_processing.py:118-176,
# dataset.py:270-288)
# ---------------------------------------------------------------------------

def test_person_run_filter_runs():
    from vptr_tpu.data.preprocessing import person_run_filter

    present = [False] * 3 + [True] * 25 + [False] * 2 + [True] * 19 \
        + [False] + [True] * 20
    runs = person_run_filter(present, min_run=20)
    # 25-run kept, 19-run dropped, trailing 20-run kept (no False after it)
    assert [len(r) for r in runs] == [25, 20]
    assert runs[0] == list(range(3, 28))
    assert runs[1][0] == 50


def test_human_detector_with_custom_detector(tmp_path):
    """Detector-agnostic: a toy 'person = bright frame' detector must produce
    the reference's *_no_empty_<idx> folder layout."""
    from PIL import Image

    from vptr_tpu.data.preprocessing import human_detector

    src = tmp_path / "frames" / "person01_boxing_d1"
    src.mkdir(parents=True)
    rng = np.random.default_rng(0)
    # 30 frames: 5 dark, 22 bright, 3 dark
    for i in range(30):
        bright = 5 <= i < 27
        img = (rng.random((16, 16, 3)) * (200 if bright else 20)
               ).astype(np.uint8)
        Image.fromarray(img).save(src / f"{i:04d}.png")

    out = tmp_path / "filtered"
    written = human_detector(str(tmp_path / "frames"), str(out),
                             detector=lambda img: img.mean() > 50,
                             min_run=20)
    assert written == {"person01_boxing_d1": 1}
    run_dir = out / "person01_boxing_d1_no_empty_0"
    assert len(list(run_dir.iterdir())) == 22


def test_mjpeg_avi_writer_roundtrip(tmp_path):
    """The from-scratch RIFF muxer must produce a well-formed MJPEG AVI whose
    frame chunks decode back (JPEG) to approximately the input frames."""
    import io
    import struct

    from PIL import Image

    from vptr_tpu.data.preprocessing import visualize_clip

    t, h, w = 4, 32, 32
    clip = np.linspace(0, 1, t * h * w, dtype=np.float32).reshape(t, h, w, 1)
    path = visualize_clip(clip, str(tmp_path / "clip.mp4"), fps=10)
    data = open(path, "rb").read()

    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    assert b"MJPG" in data and b"idx1" in data

    # walk the movi list, decode each 00dc JPEG chunk
    movi = data.index(b"movi")
    assert data[movi - 8:movi - 4] == b"LIST"
    pos = movi + 4
    frames = []
    while data[pos:pos + 4] == b"00dc":
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        jpeg = data[pos + 8:pos + 8 + size]
        frames.append(np.asarray(Image.open(io.BytesIO(jpeg))))
        pos += 8 + size + (size % 2)
    assert len(frames) == t
    want = np.repeat((clip * 255).astype(np.uint8), 3, axis=-1)
    err = np.abs(frames[0].astype(float) - want[0].astype(float)).mean()
    assert err < 8.0, f"jpeg roundtrip error {err}"


def test_dynamic_synthetic_generator():
    """The quality-eval task: accelerated/colliding digits + pixel noise,
    deterministic per (seed, index), values in [0, 1], and genuinely
    different dynamics from the linear smoke task."""
    dyn = SyntheticMovingMNIST(num_clips=4, num_past=10, num_future=10,
                               size=64, num_digits=3, motion="dynamic",
                               noise=0.03)
    p, f = dyn.get(0)
    assert p.shape == (10, 64, 64, 1) and f.shape == (10, 64, 64, 1)
    assert 0.0 <= p.min() and p.max() <= 1.0
    assert p.max() > 0.3
    p2, f2 = dyn.get(0)
    np.testing.assert_array_equal(p, p2)
    np.testing.assert_array_equal(f, f2)

    # pixel noise present: background (off-digit) pixels are non-zero
    clean = SyntheticMovingMNIST(num_clips=4, num_past=10, num_future=10,
                                 size=64, num_digits=3, motion="dynamic",
                                 noise=0.0)
    pc, _ = clean.get(0)
    assert (p > 0).mean() > 0.3        # noise touches most pixels
    assert (pc > 0).mean() < 0.3       # digits only

    # curved trajectories: frame-to-frame digit displacement is NOT constant
    # (linear motion would make second differences of the glyph centroid ~0)
    def centroids(frames):
        ys, xs = np.mgrid[0:64, 0:64]
        w = frames[..., 0] + 1e-9
        return np.stack([(w * ys).sum((1, 2)) / w.sum((1, 2)),
                         (w * xs).sum((1, 2)) / w.sum((1, 2))], -1)
    c_dyn = centroids(np.concatenate([pc, clean.get(0)[1]], 0))
    accel = np.diff(c_dyn, n=2, axis=0)
    assert np.abs(accel).max() > 0.2   # visible curvature / interactions


def test_build_dataset_default_is_dynamic():
    cfg = DataConfig(dataset="synthetic")
    ds = build_dataset(cfg, split="train")
    assert isinstance(ds, SyntheticMovingMNIST)
    assert ds.motion == "dynamic" and ds.noise > 0 and ds.num_digits == 3


def test_linear_synthetic_noise_knob():
    """synthetic_noise composes with motion="linear" too (the knobs are
    independent); values stay in [0, 1] and determinism holds."""
    noisy = SyntheticMovingMNIST(num_clips=2, num_past=5, num_future=5,
                                 size=32, motion="linear", noise=0.05)
    clean = SyntheticMovingMNIST(num_clips=2, num_past=5, num_future=5,
                                 size=32, motion="linear", noise=0.0)
    p, _ = noisy.get(0)
    pc, _ = clean.get(0)
    assert 0.0 <= p.min() and p.max() <= 1.0
    assert (p > 0).mean() > 0.3 and (pc > 0).mean() < 0.3
    np.testing.assert_array_equal(p, noisy.get(0)[0])
