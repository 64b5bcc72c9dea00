"""Native C++ runtime vs the numpy oracles."""

import os

import numpy as np
import pytest

from v2e2v_tpu import runtime
from v2e2v_tpu.ops.voxel import event_preprocess_np, events_to_voxel_grid_np

pytestmark = pytest.mark.skipif(
    not runtime.available(), reason="native toolchain unavailable"
)


def _random_events(n, w, h, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0.0, 0.1, n))
    x = rng.integers(0, w, n)
    y = rng.integers(0, h, n)
    p = rng.choice([0.0, 1.0, -1.0], n)
    return np.stack([t, x, y, p], 1)


def test_parse_events_txt(tmp_path):
    events = _random_events(500, 64, 48)
    path = tmp_path / "events.txt"
    with open(path, "w") as f:
        for t, x, y, p in events:
            f.write(f"{t:.9f} {int(x)} {int(y)} {int(p)}\n")
    got = runtime.parse_events_txt(str(path))
    np.testing.assert_allclose(got[:, 0], events[:, 0], atol=1e-9)
    np.testing.assert_array_equal(got[:, 1:], events[:, 1:])


def test_parse_empty_file(tmp_path):
    path = tmp_path / "empty.txt"
    path.write_text("")
    got = runtime.parse_events_txt(str(path))
    assert got.shape == (0, 4)


def test_parse_rejects_garbage(tmp_path):
    path = tmp_path / "bad.txt"
    path.write_text("0.1 3 4 1\nnot an event\n")
    with pytest.raises(runtime.NativeUnavailable):
        runtime.parse_events_txt(str(path))


def test_voxelize_matches_numpy_oracle():
    events = _random_events(2000, 40, 30, seed=1)
    want = events_to_voxel_grid_np(events, num_bins=5, width=40, height=30)
    got = runtime.voxelize_events(events, num_bins=5, width=40, height=30)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_voxelize_preprocess_matches_numpy():
    events = _random_events(2000, 40, 30, seed=2)
    raw = events_to_voxel_grid_np(events, num_bins=5, width=40, height=30)
    want = event_preprocess_np(raw, mode="std", filter_hot_pixel=True)
    got = runtime.voxelize_events(
        events, num_bins=5, width=40, height=30,
        preprocess=True, hot_pixel_threshold=25.0 / 5,
    )
    # native accumulates mean/std in float64 (numpy oracle sums in float32),
    # so the normalization scale differs ~1e-4 relative; pixels whose raw sum
    # sits exactly at the hot-pixel threshold can flip either way on
    # accumulation order — exclude them
    stable = np.abs(np.abs(raw) - 5.0) > 1e-3
    np.testing.assert_allclose(got[stable], want[stable], rtol=2e-3, atol=2e-4)


def test_voxelize_empty():
    got = runtime.voxelize_events(np.zeros((0, 4)), num_bins=5, width=8, height=6)
    assert got.shape == (5, 6, 8)
    assert (got == 0).all()


def test_parse_txt_page_boundary_no_trailing_newline(tmp_path):
    """A numeric token ending exactly at a page boundary with no trailing
    newline must parse (strtod on the raw mmap could read past the end)."""
    from v2e2v_tpu import runtime

    if not runtime.available():
        pytest.skip("native runtime unavailable")

    pagesize = os.sysconf("SC_PAGE_SIZE")
    row = "0.125 10 20 1\n"
    # build content whose size is exactly one page, last char numeric
    tail = "0.500 30 40 "
    n_rows = (pagesize - len(tail) - 1) // len(row)
    content = row * n_rows + tail
    content += "1" * (pagesize - len(content))  # final token runs to the edge
    assert len(content) == pagesize and content[-1].isdigit()

    path = tmp_path / "edge.txt"
    path.write_text(content)
    assert os.path.getsize(path) == pagesize

    events = runtime.parse_events_txt(str(path))
    assert events.shape == (n_rows + 1, 4)
    assert events[-1, 0] == 0.5 and events[-1, 1] == 30


def test_voxelize_rejects_out_of_range_coords():
    """Events beyond the grid must raise (numpy-oracle ``np.add.at``
    contract) instead of smashing the heap — the observed failure was a
    SIGSEGV when a 180x240 dataset met ``--image_dim 32 40``."""
    events = _random_events(200, 240, 180, seed=3)
    with pytest.raises(IndexError, match="image_dim"):
        runtime.voxelize_events(events, 5, 40, 32)
    # in-range still works
    grid = runtime.voxelize_events(events, 5, 240, 180)
    np.testing.assert_allclose(
        grid, events_to_voxel_grid_np(events, 5, 240, 180), atol=1e-5
    )
