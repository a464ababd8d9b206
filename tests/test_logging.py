"""Scalar logging: jsonl always, TensorBoard event files when enabled
(surface parity with the reference's SummaryWriter, train.py:148)."""

import glob
import json
import os

import pytest


def test_jsonl_and_tensorboard_logging(tmp_path):
    from vtaco_tpu.train.loop import JsonlLogger

    path = str(tmp_path / "logs" / "metrics.jsonl")
    logger = JsonlLogger(path, tensorboard=True)
    if logger.tb is None:
        pytest.skip("tensorboardX not installed")
    logger.add_scalar("train/loss", 0.5, 1)
    logger.add_scalar("train/loss", 0.25, 2)
    logger.add_scalar("val/iou", 0.75, 2)
    logger.close()

    with open(path) as f:
        recs = [json.loads(line) for line in f]
    assert [r["value"] for r in recs if r["tag"] == "train/loss"] == [0.5, 0.25]

    events = glob.glob(os.path.join(os.path.dirname(path),
                                    "events.out.tfevents.*"))
    assert events, "no TensorBoard event file written"
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(os.path.dirname(path))
    acc.Reload()
    assert set(acc.Tags()["scalars"]) == {"train/loss", "val/iou"}
    loss = acc.Scalars("train/loss")
    assert [s.step for s in loss] == [1, 2]
    assert loss[1].value == pytest.approx(0.25)
