"""Observability: scalar writer, GIF dumper, file logging
(reference: utils/train_summary.py:118-198)."""

import json
import logging

import numpy as np
from PIL import Image

from vptr_tpu.data.transforms import ReNormalize
from vptr_tpu.train.summary import (
    SummaryWriter,
    setup_logging,
    visualize_batch_clips,
)

RNG = np.random.default_rng(3)


def test_summary_writer_jsonl(tmp_path):
    w = SummaryWriter(str(tmp_path / "tb"))
    w.write_scalars(1, {"loss": 0.5, "acc": np.float32(0.25)},
                    prefix="train/")
    w.write_scalars(2, {"loss": 0.4}, prefix="train/")
    w.close()
    lines = [json.loads(l) for l in
             (tmp_path / "tb" / "scalars.jsonl").read_text().splitlines()]
    assert lines[0] == {"step": 1, "train/loss": 0.5, "train/acc": 0.25}
    assert lines[1]["train/loss"] == 0.4


def test_visualize_batch_clips_writes_gifs(tmp_path):
    n, tp, tf, hw = 3, 2, 3, 16
    past = RNG.random((n, tp, hw, hw, 1)).astype(np.float32)
    gt = RNG.random((n, tf, hw, hw, 1)).astype(np.float32)
    pred = RNG.random((n, tf, hw, hw, 1)).astype(np.float32)
    renorm = ReNormalize(mean=(0.1,), std=(2.0,))
    visualize_batch_clips(past, gt, pred, str(tmp_path / "gifs"),
                          renorm=renorm, desc="pred", max_samples=2)
    gifs = sorted((tmp_path / "gifs").glob("*.gif"))
    assert [g.name for g in gifs] == ["pred_0.gif", "pred_1.gif"]
    img = Image.open(gifs[0])
    assert img.n_frames == tp + tf                 # past then future frames
    assert img.size == (2 * hw, hw)                # gt | pred side by side


def test_setup_logging_writes_file(tmp_path):
    logger = setup_logging(str(tmp_path), name="vptr_tpu.test_summary")
    logger.info("hello %d", 7)
    for h in logger.handlers:
        h.flush()
    text = (tmp_path / "train_log.log").read_text()
    assert "hello 7" in text
    logging.getLogger("vptr_tpu.test_summary").handlers.clear()
