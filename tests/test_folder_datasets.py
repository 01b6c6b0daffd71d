"""KTH/BAIR frame-folder datasets against synthetic directory trees
(reference layouts: utils/dataset.py:81-218)."""

import numpy as np
import pytest
from PIL import Image

from vptr_tpu.data.datasets import bair_dataset, kth_dataset
from vptr_tpu.data.transforms import ClipTransform


def _make_frames(folder, n, size=(32, 32), rgb=False):
    folder.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        mode = "RGB" if rgb else "L"
        Image.new(mode, size, i % 255).save(folder / f"{i:04d}.png")


@pytest.fixture
def kth_root(tmp_path):
    root = tmp_path / "kth"
    # person 01 (train), person 05 (val candidate), person 17 (test)
    for action in ("boxing", "walking_no_empty"):
        _make_frames(root / action / f"person01_{action}_d1", 12)
        _make_frames(root / action / f"person05_{action}_d1", 12)
        _make_frames(root / action / f"person17_{action}_d1", 12)
    return root


def test_kth_split_semantics(kth_root):
    tf = ClipTransform(mean=(0.5,), std=(1.0,))
    train, val = kth_dataset(str(kth_root), tf, "train", num_past=3,
                             num_future=3, val_person_ids=[5])
    test = kth_dataset(str(kth_root), tf, "test", num_past=3, num_future=3)
    # 12 frames / clip_len 6 = 2 clips per folder; 2 actions each
    assert len(train) == 4   # person01 only
    assert len(val) == 4     # person05
    assert len(test) == 4    # person17
    past, future = train.get(0)
    assert past.shape == (3, 32, 32, 1)
    assert future.shape == (3, 32, 32, 1)
    # normalization applied (mean 0.5 shifts dark frames negative)
    assert past.min() < 0


def test_bair_split_semantics(tmp_path):
    root = tmp_path / "bair"
    for i in range(4):
        _make_frames(root / "train" / f"example_{i}", 12, rgb=True)
    _make_frames(root / "test" / "example_0", 12, rgb=True)

    tf = ClipTransform(mean=(0.5, 0.5, 0.5), std=(1.0, 1.0, 1.0))
    train, val = bair_dataset(str(root), tf, "train", num_past=2,
                              num_future=4, train_val_ratio=0.75, seed=1)
    # 4 folders x 2 clips = 8 clips; 75/25 split
    assert len(train) == 6 and len(val) == 2
    test = bair_dataset(str(root), tf, "test", num_past=2, num_future=4)
    assert len(test) == 2
    past, future = test.get(0)
    assert past.shape == (2, 32, 32, 3)
    assert future.shape == (4, 32, 32, 3)

    # the split is deterministic for a fixed seed (reference seeds its
    # random_split with 2021, utils/dataset.py:61)
    train2, val2 = bair_dataset(str(root), tf, "train", num_past=2,
                                num_future=4, train_val_ratio=0.75, seed=1)
    np.testing.assert_array_equal(train.get(0)[0], train2.get(0)[0])
