"""Output writers, event previews, and the cv2 VideoReader."""

import argparse
import csv
import os

import numpy as np
import pytest

from v2e2v_tpu.utils.configs import set_configs
from v2e2v_tpu.utils.data_io import (
    EvalWriter,
    EventWriter,
    ImageWriter,
    make_event_preview,
)


def _cfgs(out, **kw):
    parser = argparse.ArgumentParser()
    set_configs(parser)
    args = ["-o", out, "--test_data_name", "seq"]
    for k, v in kw.items():
        args.append(f"--{k}")
    return parser.parse_args(args)


def test_make_event_preview_modes():
    voxel = np.zeros((5, 6, 8), np.float32)
    voxel[0, 1, 2] = 3.0   # positive sum
    voxel[1, 4, 5] = -2.0  # negative sum

    rb = make_event_preview(voxel, mode="red-blue")
    assert rb.shape == (6, 8, 3) and rb.dtype == np.uint8
    assert rb[1, 2, 0] == 255 and rb[4, 5, 2] == 255
    assert rb[0, 0].sum() == 0

    gray = make_event_preview(voxel, mode="grayscale")
    assert gray.shape == (6, 8)
    assert gray[1, 2] > gray[0, 0] > gray[4, 5]  # +3 > 0 > -2 after clip map

    # num_bins_to_show limits the summed bins
    only_last = make_event_preview(voxel, mode="red-blue", num_bins_to_show=1)
    assert only_last[1, 2, 0] == 0  # bin 0's event excluded


def test_image_and_event_writers(tmp_path):
    out = str(tmp_path / "out")
    cfgs = _cfgs(out, is_write_event=True)
    iw = ImageWriter(cfgs, "model", "seq")
    ew = EventWriter(cfgs, "model", "seq")
    iw(np.full((4, 4), 128, np.uint8), 3)
    ew(np.zeros((4, 4, 3), np.uint8), 3)
    assert os.path.exists(os.path.join(out, "model", "seq", "frame_0000000003.png"))
    assert os.path.exists(
        os.path.join(out, "model", "seq", "events", "events_0000000003.png")
    )


def test_writers_respect_disable_flags(tmp_path):
    out = str(tmp_path / "out")
    cfgs = _cfgs(out, no_write_image=True)
    iw = ImageWriter(cfgs, "model", "seq")
    iw(np.zeros((4, 4), np.uint8), 1)
    assert not os.path.exists(os.path.join(out, "model", "seq"))


def test_eval_writer_csv_format(tmp_path):
    out = str(tmp_path / "out")
    cfgs = _cfgs(out)
    ew = EvalWriter(cfgs, "model", "seq")
    ew(["Dataset", "MSE"], ["seq", 0.123])
    with open(os.path.join(out, "model", "seq", "result.csv")) as f:
        rows = list(csv.reader(f, delimiter="\t"))
    assert rows[0] == ["Dataset", "MSE"]
    assert rows[1] == ["seq", "0.123"]


def test_video_reader_roundtrip(tmp_path):
    import cv2

    from v2e2v_tpu.data.video_readers import VideoReader

    h, w, n = 32, 48, 12
    path = str(tmp_path / "clip.avi")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30.0, (w * 4, h * 4))
    rng = np.random.default_rng(0)
    for i in range(n):
        frame = np.full((h * 4, w * 4, 3), 40 + 10 * i, np.uint8)
        vw.write(frame)
    vw.release()

    reader = VideoReader([h, w], ds=(0.25, 0.25))
    reader.initialize(path)
    assert reader.num_frames >= n
    frames, gt, ts = reader.update_frame_pack(6)
    assert frames.shape == (6, h, w)
    assert len(ts) == 6 and ts[1] == pytest.approx(1 / 30.0)
    # mean brightness grows with the written ramp
    assert frames[5].mean() > frames[0].mean()
