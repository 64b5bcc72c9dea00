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


def test_generate_events_roundtrip_to_training(synth_dir, tmp_path):
    """V2E generation round-trip (VERDICT r4 #3): ``scripts/generate_events.py``
    raw-mode npz output -> ``make_train_e2v_txt`` manifest ->
    ``TrainFixNEventData`` -> one E2V training step. Pins that the generated
    event files are consumable by the training path end to end (reference
    flow: V2E_Generation events feed ``train_e2v.txt``,
    ``data_readers/train_data_loaders.py:106-222``)."""
    import argparse
    import shutil

    # frames-only copy of one synthetic sequence (events come from the tool)
    data_dir = str(tmp_path / "gen_rt")
    seq = "sequence_0000000001"
    os.makedirs(data_dir)
    shutil.copytree(
        os.path.join(synth_dir, seq, "frames"),
        os.path.join(data_dir, seq, "frames"),
    )

    env = dict(os.environ, JAX_PLATFORMS="cpu", V2E2V_PLATFORM="cpu")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
    # correctness-tier compile flags (conftest.py) for the subprocess too —
    # it compiles its own emulator programs
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + " --xla_backend_optimization_level=0"
        + " --xla_llvm_disable_expensive_passes=true"
    )
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "generate_events.py"),
            "--path_to_test_data", data_dir, "--output_folder", data_dir,
            "--image_dim", "24", "32", "--num_pack_frames", "4",
            "--test_img_num", "16", "--C", "0.3", "--refractory_period_s", "0.001",
        ],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    ev_dir = os.path.join(data_dir, seq, "events")
    npz = sorted(f for f in os.listdir(ev_dir) if f.endswith(".npz"))
    assert npz, "generate_events.py produced no event files"
    first = np.load(os.path.join(ev_dir, npz[0]))
    assert set(first.files) >= {"t", "x", "y", "p"}

    from v2e2v_tpu.data.datasets import TrainFixNEventData, iterate_batches
    from v2e2v_tpu.data.manifests import make_train_e2v_txt
    from v2e2v_tpu.utils.configs import set_configs

    n = make_train_e2v_txt(data_dir)
    assert n > 0
    parser = argparse.ArgumentParser()
    set_configs(parser)
    cfgs = parser.parse_args(
        ["--path_to_train_data", data_dir, "--image_dim", "24", "32",
         "--num_events", "200", "--len_sequence", "2"]
    )
    ds = TrainFixNEventData(os.path.join(data_dir, "train_e2v.txt"), cfgs)
    assert len(ds) > 0

    import jax
    import optax

    from v2e2v_tpu.models.cista import CistaConfig, init_cista_lstc
    from v2e2v_tpu.parallel.mesh import make_e2v_train_step, make_mesh

    cfg = CistaConfig(image_dim=(24, 32), base_channels=8, depth=2, num_bins=5)
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)
    step = make_e2v_train_step(cfg, tx, make_mesh(1, 1))
    seq_events, _img, gt = next(iter(iterate_batches(ds, 1, shuffle=False)))
    voxel_seq = np.moveaxis(seq_events, 1, 0)
    params, opt_state, loss = step(params, opt_state, voxel_seq, gt)
    assert np.isfinite(float(loss)), float(loss)
