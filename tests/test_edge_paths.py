"""Edge paths: continuation-pack timestamp shapes, time units, zip event
tables, bf16 stream pool."""

import os
import zipfile

import jax
import jax.numpy as jnp
import numpy as np

from v2e2v_tpu.models.emulator import EmulatorConfig, emulate_pack

KEY = jax.random.PRNGKey(0)


def test_emulate_pack_accepts_n_plus_one_timestamps():
    """The reference continuation pack supplies N frames with N+1 timestamps
    (cached previous stamp prepended, video_readers.py:101); the emulator
    must pair frames[i] with timestamps[i] and ignore the last stamp."""
    h, w, n = 8, 8, 4
    rng = np.random.default_rng(0)
    base = rng.uniform(40, 150, (h, w)).astype(np.float32)
    frames = np.clip(
        np.stack([base * (1 + 0.1 * i) for i in range(n)], 0)[None], 0, 255
    )
    cfg = EmulatorConfig(
        pos_thres=0.2, neg_thres=0.2, sigma_thres=0.0, leak_rate_hz=0.0,
        shot_noise_rate_hz=0.0,
    )
    t_n = np.linspace(0.0, 0.03, n, dtype=np.float32)[None]
    t_np1 = np.concatenate([t_n, [[0.04]]], axis=1)  # extra trailing stamp

    v1, n1, _ = emulate_pack(cfg, None, jnp.asarray(frames), jnp.asarray(t_n), key=KEY)
    v2, n2, _ = emulate_pack(cfg, None, jnp.asarray(frames), jnp.asarray(t_np1), key=KEY)
    assert int(n1) == int(n2)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)


def test_read_timestamps_units(tmp_path):
    from v2e2v_tpu.data.video_readers import read_timestamps_file

    p = tmp_path / "timestamps.txt"
    p.write_text("0 1000000\n1 2000000\n")
    assert read_timestamps_file(str(p), "us") == [1.0, 2.0]
    p2 = tmp_path / "images.txt"  # non-timestamps name -> column 0
    p2.write_text("1500 foo\n2500 bar\n")
    assert read_timestamps_file(str(p2), "ms") == [1.5, 2.5]
    p3 = tmp_path / "timestamp.txt"
    p3.write_text("3000000000\n")
    assert read_timestamps_file(str(p3), "ns") == [3.0]


def test_event_table_zip(tmp_path):
    """ECD-style events.zip goes through the pandas path (the native parser
    handles only txt/csv)."""
    from v2e2v_tpu.data.event_readers import RefTimeEventReader

    rows = "0.05 1 2 1\n0.15 3 4 0\n0.25 5 6 1\n"
    txt = tmp_path / "events.txt"
    txt.write_text(rows)
    zpath = tmp_path / "events.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.write(txt, "events.txt")

    reader = RefTimeEventReader(str(zpath), [0.0, 0.1, 0.2, 0.3])
    windows = list(reader)
    assert len(windows) == 3
    assert windows[1][0, 1] == 3


def test_stream_pool_bf16_default():
    from v2e2v_tpu.models.cista import CistaConfig, init_cista_lstc
    from v2e2v_tpu.serving import StreamPool

    cfg = CistaConfig(image_dim=(16, 16), base_channels=8, depth=2, num_bins=5)
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    pool = StreamPool(cfg, params, capacity=2)  # default bf16
    sid = pool.attach()
    vox = np.random.default_rng(0).normal(size=(16, 16, 5)).astype(np.float32)
    out = pool.step({sid: vox})[sid]
    assert out.dtype == np.float32  # fetched output upcast
    assert np.isfinite(out).all() and 0.0 <= out.min() and out.max() <= 1.0
