"""Data layer: readers, pack logic, training datasets, checkpoint round-trip."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("synth"))
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "make_synth_data.py"),
            "--out_dir", out, "--num_sequences", "2", "--num_frames", "24",
            "--image_dim", "32", "40", "--num_pack_frames", "6",
        ],
        check=True,
        capture_output=True,
    )
    return out


def test_ref_time_event_reader_windows(tmp_path):
    from v2e2v_tpu.data.event_readers import RefTimeEventReader

    # events at t = 0.05, 0.15, 0.25, 0.35; images at t = 0.0, 0.1, 0.2, 0.3
    path = tmp_path / "events.txt"
    rows = [(0.05, 1, 2, 1), (0.15, 3, 4, 0), (0.25, 5, 6, 1), (0.35, 7, 8, 0)]
    path.write_text("".join(f"{t} {x} {y} {p}\n" for t, x, y, p in rows))

    reader = RefTimeEventReader(str(path), [0.0, 0.1, 0.2, 0.3])
    windows = list(reader)
    assert len(windows) == 3
    # times rebased by T_image[0] (=0 here); one event per window
    assert windows[0].shape == (1, 4) and windows[0][0, 1] == 1
    assert windows[1][0, 1] == 3
    assert windows[2][0, 1] == 5


def test_pack_reader_continuation_rule(synth_dir):
    from v2e2v_tpu.data.video_readers import ImageReader

    reader = ImageReader([32, 40])
    reader.initialize(os.path.join(synth_dir, "sequence_0000000001"))

    f1, gt1, t1 = reader.update_frame_pack(6)
    assert f1.shape[0] == 6 and len(t1) == 6
    f2, gt2, t2 = reader.update_frame_pack(6)
    # continuation: 5 new frames, cached previous timestamp prepended
    assert f2.shape[0] == 5 and len(t2) == 6
    assert t2[0] == t1[-1]
    np.testing.assert_array_equal(gt2, f2[-1])


def test_event_frame_pack_real_mode_splits(synth_dir):
    from v2e2v_tpu.data.video_readers import ImageReader

    reader = ImageReader([32, 40], num_bins=5, is_with_events=True)
    reader.initialize(os.path.join(synth_dir, "sequence_0000000001"))

    # small budget -> windows with > budget events split into chunks
    grids, gt = reader.update_event_frame_pack(limit_num_events=50, mode="real")
    assert len(grids) >= 1
    for g in grids:
        assert g.shape == (5, reader.height, reader.width)
    assert gt.shape == (reader.height, reader.width)


def test_event_frame_pack_upsampled_mode_accumulates(synth_dir):
    from v2e2v_tpu.data.video_readers import ImageReader

    reader = ImageReader([32, 40], num_bins=5, is_with_events=True)
    reader.initialize(os.path.join(synth_dir, "sequence_0000000002"))
    grids, gt = reader.update_event_frame_pack(limit_num_events=10**9, mode="upsampled")
    # budget never reached -> consumed the whole sequence into one grid
    assert len(grids) == 1
    assert reader.ending


def test_train_fix_n_event_data(synth_dir):
    import argparse

    from v2e2v_tpu.data.datasets import TrainFixNEventData
    from v2e2v_tpu.utils.configs import set_configs

    parser = argparse.ArgumentParser()
    set_configs(parser)
    cfgs = parser.parse_args(
        ["--path_to_train_data", synth_dir, "--image_dim", "32", "40",
         "--num_events", "300", "--len_sequence", "3"]
    )
    ds = TrainFixNEventData(os.path.join(synth_dir, "train_e2v.txt"), cfgs)
    assert len(ds) > 0
    seq_events, img, gt = ds[0]
    assert seq_events.ndim == 4 and seq_events.shape[-1] == 5  # [T,H,W,nb]
    assert img.shape == (32, 40, 1) and gt.shape == (32, 40, 1)
    assert gt.max() <= 1.0


def test_train_seq_data(synth_dir):
    from v2e2v_tpu.data.datasets import TrainSeqData, iterate_batches

    ds = TrainSeqData(
        os.path.join(synth_dir, "train_v2e2v.txt"), synth_dir,
        len_sequence=2, num_pack_frames=6,
    )
    assert len(ds) > 0
    ts, images, gt = ds[0]
    assert ts.shape == (2, 6)
    assert images.shape == (2, 6, 32, 40)
    assert images.max() > 1.5  # 0-255 domain for the emulator
    assert gt.shape == (2, 32, 40, 1) and gt.max() <= 1.0

    batches = list(iterate_batches(ds, batch_size=1, shuffle=False))
    assert batches[0][1].shape == (1, 2, 6, 32, 40)


def test_train_fix_n_event_data_drop_seq_tails(synth_dir):
    """--drop_seq_tails keeps only full-length sequences (uniform [T, ...]
    shapes -> one XLA compile instead of one per distinct tail length)."""
    import argparse

    from v2e2v_tpu.data.datasets import TrainFixNEventData
    from v2e2v_tpu.utils.configs import set_configs

    parser = argparse.ArgumentParser()
    set_configs(parser)
    # num_events=1 -> every interval is its own group; len_sequence=9 over
    # ~23 groups/video leaves a >=5-group tail at the video boundary
    args = ["--path_to_train_data", synth_dir, "--image_dim", "32", "40",
            "--num_events", "1", "--len_sequence", "9"]
    cfgs = parser.parse_args(args)
    ds = TrainFixNEventData(os.path.join(synth_dir, "train_e2v.txt"), cfgs)
    lens = [len(s) for s in ds.sequence_line_id]
    assert any(n < 9 for n in lens), "fixture must produce a tail"

    cfgs_drop = parser.parse_args(args + ["--drop_seq_tails"])
    ds_drop = TrainFixNEventData(os.path.join(synth_dir, "train_e2v.txt"), cfgs_drop)
    lens_drop = [len(s) for s in ds_drop.sequence_line_id]
    assert all(n == 9 for n in lens_drop)
    assert len(ds_drop) == sum(n == 9 for n in lens)


def test_train_seq_data_drop_seq_tails(tmp_path):
    from v2e2v_tpu.data.datasets import TrainSeqData

    # 8 pack lines in one video; len_sequence=4, window step 5:
    # idx=0 -> full window, idx=5 -> 3-line tail (kept only without drop)
    n = 2
    lines = []
    for i in range(8):
        ts = f"{2 * i}.0 {2 * i + 1}.0"
        frames = f"f{2 * i}.png f{2 * i + 1}.png"
        lines.append(f"1 {ts} {frames}\n")
    manifest = tmp_path / "train_v2e2v.txt"
    manifest.write_text("".join(lines))

    ds = TrainSeqData(str(manifest), str(tmp_path), len_sequence=4, num_pack_frames=n)
    assert ds.len_seq == [4, 3]
    ds_drop = TrainSeqData(
        str(manifest), str(tmp_path), len_sequence=4, num_pack_frames=n,
        drop_seq_tails=True,
    )
    assert ds_drop.len_seq == [4]
    assert ds_drop.start_seq_id == [ds.start_seq_id[0]]


def test_iterate_batches_num_workers_matches_inline(synth_dir):
    """Spawn-worker loading yields bit-identical batches in the same order as
    in-process loading (incl. per-sample-seeded --add_noise draws)."""
    import argparse

    from v2e2v_tpu.data.datasets import TrainFixNEventData, iterate_batches
    from v2e2v_tpu.utils.configs import set_configs

    parser = argparse.ArgumentParser()
    set_configs(parser)
    cfgs = parser.parse_args(
        ["--path_to_train_data", synth_dir, "--image_dim", "32", "40",
         "--num_events", "300", "--len_sequence", "3", "--add_noise"]
    )
    ds = TrainFixNEventData(os.path.join(synth_dir, "train_e2v.txt"), cfgs)
    inline = list(iterate_batches(ds, batch_size=2, shuffle=True, seed=3))
    pooled = list(
        iterate_batches(ds, batch_size=2, shuffle=True, seed=3, num_workers=2)
    )
    assert len(inline) == len(pooled) > 0
    for a, b in zip(inline, pooled):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


def test_cache_samples_with_workers_fills_parent_cache(synth_dir):
    """Workers return raw samples that the PARENT caches: after one pass the
    cache is fully populated, and a second (workerless) pass is bit-identical
    to an uncached in-process epoch."""
    import argparse

    from v2e2v_tpu.data.datasets import TrainFixNEventData, iterate_batches
    from v2e2v_tpu.utils.configs import set_configs

    parser = argparse.ArgumentParser()
    set_configs(parser)
    base = ["--path_to_train_data", synth_dir, "--image_dim", "32", "40",
            "--num_events", "300", "--len_sequence", "3", "--add_noise"]
    ds = TrainFixNEventData(
        os.path.join(synth_dir, "train_e2v.txt"),
        parser.parse_args(base + ["--cache_samples"]),
    )
    pooled = list(iterate_batches(ds, 2, shuffle=True, seed=5, num_workers=2))
    assert len(ds._cache) == len(ds)

    ds_plain = TrainFixNEventData(
        os.path.join(synth_dir, "train_e2v.txt"), parser.parse_args(base)
    )
    inline = list(iterate_batches(ds_plain, 2, shuffle=True, seed=5))
    assert len(inline) == len(pooled) > 0
    for a, b in zip(inline, pooled):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    # second epoch: served from the parent cache, still equal to fresh loads
    ds.epoch = ds_plain.epoch = 1
    again_cached = list(iterate_batches(ds, 2, shuffle=True, seed=6))
    again_plain = list(iterate_batches(ds_plain, 2, shuffle=True, seed=6))
    for a, b in zip(again_plain, again_cached):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


def test_cache_samples_bitwise_and_fresh_noise(synth_dir):
    """--cache_samples returns bit-identical samples across epochs, while
    --add_noise still draws fresh augmentation per epoch on top of the
    (noiseless) cache."""
    import argparse

    from v2e2v_tpu.data.datasets import TrainFixNEventData, TrainSeqData
    from v2e2v_tpu.utils.configs import set_configs

    parser = argparse.ArgumentParser()
    set_configs(parser)
    base = ["--path_to_train_data", synth_dir, "--image_dim", "32", "40",
            "--num_events", "300", "--len_sequence", "3"]
    cfgs = parser.parse_args(base + ["--cache_samples"])
    ds = TrainFixNEventData(os.path.join(synth_dir, "train_e2v.txt"), cfgs)
    a = ds[0]
    b = ds[0]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # cached == uncached
    ds_plain = TrainFixNEventData(
        os.path.join(synth_dir, "train_e2v.txt"), parser.parse_args(base)
    )
    for x, y in zip(a, ds_plain[0]):
        np.testing.assert_array_equal(x, y)

    cfgs_n = parser.parse_args(base + ["--cache_samples", "--add_noise"])
    ds_n = TrainFixNEventData(os.path.join(synth_dir, "train_e2v.txt"), cfgs_n)
    ds_n.epoch = 0
    e0 = ds_n[0][0]
    ds_n.epoch = 1
    e1 = ds_n[0][0]
    assert not np.array_equal(e0, e1)  # fresh draw per epoch
    np.testing.assert_array_equal(ds_n[0][1], a[1])  # img untouched by noise

    seq = TrainSeqData(
        os.path.join(synth_dir, "train_v2e2v.txt"), synth_dir,
        len_sequence=2, num_pack_frames=6, cache_samples=True,
    )
    s0, s1 = seq[0], seq[0]
    for x, y in zip(s0, s1):
        np.testing.assert_array_equal(x, y)
    seq_plain = TrainSeqData(
        os.path.join(synth_dir, "train_v2e2v.txt"), synth_dir,
        len_sequence=2, num_pack_frames=6,
    )
    for x, y in zip(s0, seq_plain[0]):
        np.testing.assert_array_equal(x, y)


def test_checkpoint_torch_roundtrip(tmp_path):
    import jax
    import torch

    from v2e2v_tpu.models.cista import CistaConfig, init_cista_lstc
    from v2e2v_tpu.utils.checkpoint import (
        convert_torch_state_dict,
        export_torch_state_dict,
        load_torch_checkpoint,
    )

    cfg = CistaConfig(image_dim=(16, 16), base_channels=8, depth=3, num_bins=5)
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)

    sd = export_torch_state_dict(params, "cista-lstc", depth=3)
    back = convert_torch_state_dict(sd, "cista-lstc")

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[path]), atol=0, err_msg=str(path)
        )

    # .pth.tar round trip incl. epoch field
    sd_t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    p = tmp_path / "ckpt.pth.tar"
    torch.save({"epoch": 7, "state_dict": sd_t}, str(p))
    params2, epoch, v2e = load_torch_checkpoint(str(p), "cista-lstc")
    assert epoch == 7 and v2e is None
    np.testing.assert_allclose(
        np.asarray(params2["We"]["weight"]), np.asarray(params["We"]["weight"])
    )


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax

    from v2e2v_tpu.models.cista import CistaConfig, init_cista_lstc
    from v2e2v_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg = CistaConfig(image_dim=(16, 16), base_channels=8, depth=2, num_bins=5)
    params = init_cista_lstc(jax.random.PRNGKey(1), cfg)
    payload = {"epoch": 3, "params": params, "v2e_params": {"C": 0.6, "pl": 1.5}}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, payload)
    back = load_checkpoint(path)
    assert back["epoch"] == 3
    assert float(back["v2e_params"]["C"]) == 0.6
    np.testing.assert_allclose(
        np.asarray(back["params"]["We"]["weight"]), np.asarray(params["We"]["weight"])
    )


def test_prefetch_iterator_order_and_errors():
    from v2e2v_tpu.data.prefetch import prefetch_iterator

    assert list(prefetch_iterator(range(10), size=3)) == list(range(10))

    def boom():
        yield 1
        raise RuntimeError("producer failed")

    it = prefetch_iterator(boom(), size=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer failed"):
        list(it)


def test_prefetch_iterator_end_not_dropped_when_queue_full():
    """Regression: with a slow consumer the producer finishes while the
    buffer is still full — the end-of-stream marker must not be dropped
    (a dropped marker hangs the consumer forever on q.get())."""
    import threading
    import time

    from v2e2v_tpu.data.prefetch import prefetch_iterator

    out = []

    def consume():
        for x in prefetch_iterator(iter(range(3)), size=1):
            time.sleep(0.3)  # producer completes while the queue is full
            out.append(x)

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    t.join(timeout=15)
    assert not t.is_alive(), "consumer hung waiting for a dropped END marker"
    assert out == [0, 1, 2]


def test_prefetch_iterator_abandonment_closes_source():
    """Dropping the prefetch generator mid-stream must stop the producer and
    close the source iterator (releasing e.g. worker pools)."""
    import time

    from v2e2v_tpu.data.prefetch import prefetch_iterator

    closed = []

    def src():
        try:
            for i in range(1000):
                yield i
        finally:
            closed.append(True)

    it = prefetch_iterator(src(), size=2)
    assert next(it) == 0
    it.close()  # consumer abandons mid-stream
    deadline = time.time() + 10
    while not closed and time.time() < deadline:
        time.sleep(0.05)
    assert closed, "source iterator was not closed after abandonment"


def test_device_prefetch_places_on_device():
    import jax
    import numpy as np

    from v2e2v_tpu.data.prefetch import device_prefetch

    batches = [(np.ones((2, 3)), np.zeros((2,))) for _ in range(3)]
    out = list(
        device_prefetch(batches, transform=lambda b: (b[0] * 2, b[1]))
    )
    assert len(out) == 3
    assert isinstance(out[0][0], jax.Array)
    np.testing.assert_array_equal(np.asarray(out[0][0]), 2 * np.ones((2, 3)))


def test_opt_state_checkpoint_roundtrip(tmp_path):
    """Adam moments survive save -> orbax restore -> restore_opt_state."""
    import jax
    import jax.numpy as jnp
    import optax

    from v2e2v_tpu.utils.checkpoint import (
        load_checkpoint,
        restore_opt_state,
        save_checkpoint,
    )

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    for _ in range(3):
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, {"epoch": 3, "params": params, "opt_state": opt_state})
    payload = load_checkpoint(path)

    fresh = tx.init(payload["params"])
    restored = restore_opt_state(fresh, payload.get("opt_state"))
    for a, b in zip(
        jax.tree_util.tree_leaves(opt_state), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # a further update must work on the restored (typed) state
    updates, _ = tx.update(grads, restored, payload["params"])
    assert jax.tree_util.tree_structure(updates) == jax.tree_util.tree_structure(
        payload["params"]
    )

    # legacy checkpoints without opt_state fall back to the fresh template
    assert restore_opt_state(fresh, None) is fresh
