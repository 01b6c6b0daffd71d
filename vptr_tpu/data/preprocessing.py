"""Offline data preparation utilities.

Parity with the reference's L0 layer (reference: utils/pre_processing.py,
utils/read_BAIR_tfrecords.py):

* video <-> frame-folder conversion via the ffmpeg binary;
* BAIR tfrecord -> example_N/NNNN.png extraction (needs tensorflow, which is
  baked into this image but gated at import so the rest of the package never
  depends on it);
* dataset mean/std estimation (reference: utils/dataset.py:482-531).

The reference's detectron2 person-filter for KTH (utils/pre_processing.py:
118-176) is documented as out-of-scope external tooling: it needs a
detectron2 install + GPU weights; the dataset layout it produces
(``*_no_empty`` folders) is consumed by our KTH loader as-is.
"""

from __future__ import annotations

import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np


def vid2frames(video_path: str, frames_dir: str, fps: Optional[int] = None):
    """Extract video frames to ``frames_dir/%04d.png`` with ffmpeg
    (reference: utils/pre_processing.py:34-50)."""
    out = Path(frames_dir)
    out.mkdir(parents=True, exist_ok=True)
    cmd = ["ffmpeg", "-y", "-i", str(video_path)]
    if fps:
        cmd += ["-vf", f"fps={fps}"]
    cmd += [str(out / "%04d.png")]
    subprocess.run(cmd, check=True, capture_output=True)


def frames2vid(frames_dir: str, video_path: str, fps: int = 10,
               pattern: str = "%04d.png"):
    """Assemble frames back into a video (reference:
    utils/pre_processing.py:52-64)."""
    cmd = ["ffmpeg", "-y", "-framerate", str(fps),
           "-i", str(Path(frames_dir) / pattern),
           "-pix_fmt", "yuv420p", str(video_path)]
    subprocess.run(cmd, check=True, capture_output=True)


def subsample_frames(frames_dir: str, out_dir: str, keep_every: int = 2):
    """Keep every k-th frame (reference: utils/pre_processing.py:66-76)."""
    import shutil

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    files = sorted(Path(frames_dir).glob("*"))
    for i, f in enumerate(files[::keep_every]):
        shutil.copy(f, out / f"{i:04d}{f.suffix}")


def read_bair_tfrecords(tfrecord_dir: str, out_dir: str,
                        image_key: str = "image_aux1",
                        frames_per_traj: int = 30):
    """Convert BAIR push tfrecords into ``example_N/0000.png`` frame folders
    (reference: utils/read_BAIR_tfrecords.py:10-52). Requires tensorflow."""
    import tensorflow as tf  # gated: only this function needs TF
    from PIL import Image

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    files = sorted(Path(tfrecord_dir).glob("*.tfrecord*"))
    example_idx = 0
    for fpath in files:
        for record in tf.data.TFRecordDataset(str(fpath)):
            ex = tf.train.Example()
            ex.ParseFromString(record.numpy())
            folder = out / f"example_{example_idx}"
            folder.mkdir(exist_ok=True)
            for t in range(frames_per_traj):
                key = f"{t}/{image_key}/encoded"
                if key not in ex.features.feature:
                    break
                raw = ex.features.feature[key].bytes_list.value[0]
                arr = np.frombuffer(raw, np.uint8).reshape(64, 64, 3)
                Image.fromarray(arr).save(folder / f"{t:04d}.png")
            example_idx += 1
    return example_idx


def mean_std_compute(dataset, color_mode: str = "RGB",
                     max_items: Optional[int] = None
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Estimate per-channel mean/std over a dataset of (past, future) clips
    (reference: utils/dataset.py:482-531). std = sqrt(E[x^2] - E[x]^2)."""
    sum_img = None
    sq_img = None
    n = 0
    total = len(dataset) if max_items is None else min(len(dataset),
                                                       max_items)
    for i in range(total):
        past, future = dataset.get(i)
        clip = np.concatenate([past, future], axis=0).astype(np.float64)
        n += clip.shape[0]
        s = clip.sum(axis=0)
        if sum_img is None:
            sum_img, sq_img = s, np.square(clip).sum(axis=0)
        else:
            sum_img += s
            sq_img += np.square(clip).sum(axis=0)
    mean_img = sum_img / n
    mean_sq = sq_img / n
    if color_mode == "RGB":
        mean = mean_img.mean(axis=(0, 1))
        std = np.sqrt(mean_sq.mean(axis=(0, 1)) - np.square(mean))
    else:
        mean = np.array([mean_img.mean()])
        std = np.sqrt(np.array([mean_sq.mean()]) - np.square(mean))
    return mean.astype(np.float32), std.astype(np.float32)
