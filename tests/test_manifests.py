"""Manifest generators + offline sequence iterators (reference C11)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("synth_m"))
    subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "make_synth_data.py"),
            "--out_dir", out, "--num_sequences", "2", "--num_frames", "16",
            "--image_dim", "24", "32", "--num_pack_frames", "4",
        ],
        check=True, capture_output=True,
    )
    return out


def test_make_train_txt(synth_dir):
    from v2e2v_tpu.data.manifests import make_train_txt

    n = make_train_txt(synth_dir, "manifest_e2v.txt", num_intervals=3, step=2)
    assert n > 0
    lines = open(os.path.join(synth_dir, "manifest_e2v.txt")).read().splitlines()
    parts = lines[0].split()
    # video_idx t0 t1 + 4 frames + 3 event files
    assert len(parts) == 3 + 4 + 3
    assert parts[3].endswith(".png") and parts[-1].endswith(".npz")
    assert float(parts[2]) > float(parts[1])


def test_make_train_txt_wo_events(synth_dir):
    from v2e2v_tpu.data.manifests import make_train_txt_wo_events
    from v2e2v_tpu.data.datasets import TrainSeqData

    n = make_train_txt_wo_events(synth_dir, "manifest_v2e2v.txt", num_frames=4, step=3)
    assert n > 0
    # the generated manifest round-trips through TrainSeqData
    ds = TrainSeqData(
        os.path.join(synth_dir, "manifest_v2e2v.txt"), synth_dir,
        len_sequence=3, num_pack_frames=4,
    )
    assert len(ds) > 0
    ts, images, gt = ds[0]
    assert images.shape[1:] == (4, 24, 32)


def test_get_sequence_or_none(synth_dir, tmp_path):
    from v2e2v_tpu.data.manifests import get_sequence_or_none

    kind, frames, ts = get_sequence_or_none(
        os.path.join(synth_dir, "sequence_0000000001")
    )
    assert kind == "images" and len(frames) == 16 and len(ts) == 16
    assert get_sequence_or_none(str(tmp_path)) is None


def test_image_sequence_iterator(synth_dir):
    from v2e2v_tpu.data.manifests import ImageSequence

    seq = ImageSequence(os.path.join(synth_dir, "sequence_0000000001"))
    pairs = list(seq)
    assert len(pairs) == 15
    img0, img1, t0, t1 = pairs[0]
    assert img0.shape == (24, 32) and t1 > t0


def test_make_train_e2v_txt_roundtrip(synth_dir):
    """Generated-events manifest round-trips through TrainFixNEventData."""
    import argparse

    from v2e2v_tpu.data.datasets import TrainFixNEventData
    from v2e2v_tpu.data.manifests import make_train_e2v_txt
    from v2e2v_tpu.utils.configs import set_configs

    n = make_train_e2v_txt(synth_dir, "gen_e2v.txt")
    assert n > 0
    parser = argparse.ArgumentParser()
    set_configs(parser)
    cfgs = parser.parse_args(
        ["--path_to_train_data", synth_dir, "--image_dim", "24", "32",
         "--num_events", "100", "--len_sequence", "2"]
    )
    ds = TrainFixNEventData(os.path.join(synth_dir, "gen_e2v.txt"), cfgs)
    assert len(ds) > 0
    seq_events, img, gt = ds[0]
    assert seq_events.shape[-1] == 5
