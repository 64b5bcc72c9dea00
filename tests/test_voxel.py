import jax.numpy as jnp
import numpy as np
import pytest

from v2e2v_tpu.ops.voxel import (
    event_preprocess,
    event_preprocess_np,
    events_to_voxel_grid,
    events_to_voxel_grid_np,
)


def _to_device_args(events, capacity):
    n = len(events)
    t = np.zeros(capacity, np.float32)
    x = np.zeros(capacity, np.int32)
    y = np.zeros(capacity, np.int32)
    p = np.zeros(capacity, np.float32)
    if n:
        t[:n] = events[:, 0]
        x[:n] = events[:, 1]
        y[:n] = events[:, 2]
        p[:n] = events[:, 3]
    # poison the padding region to prove masking works
    t[n:] = 999.0
    x[n:] = 1
    y[n:] = 1
    p[n:] = 1.0
    return jnp.asarray(t), jnp.asarray(x), jnp.asarray(y), jnp.asarray(p), jnp.asarray(n)


def test_hand_computed_two_events():
    # two events, num_bins=3: ts normalized to [0, 2]
    # e0: t=0 -> bin 0, weight 1; e1: t=0.5 (norm 1.0)? use t in seconds:
    events = np.array(
        [
            [0.0, 1, 2, 1],   # -> ts_norm = 0, bin0 += 1
            [1.0, 3, 0, 0],   # -> ts_norm = 2, pol 0->-1, bin2 += -1
        ],
        dtype=np.float64,
    )
    grid = events_to_voxel_grid_np(events, num_bins=3, width=5, height=4)
    want = np.zeros((3, 4, 5), np.float32)
    want[0, 2, 1] = 1.0
    want[2, 0, 3] = -1.0
    np.testing.assert_allclose(grid, want, atol=1e-6)


def test_hand_computed_bilinear_split():
    # three events: middle event at normalized t=1.5 splits between bins 1, 2
    events = np.array(
        [
            [0.0, 0, 0, 1],
            [0.75, 2, 1, 1],  # ts_norm = 3*(0.75)/1 ... num_bins=4: (4-1)*0.75 = 2.25
            [1.0, 0, 0, -1],
        ],
        dtype=np.float64,
    )
    grid = events_to_voxel_grid_np(events, num_bins=4, width=3, height=2)
    assert abs(grid[2, 1, 2] - 0.75) < 1e-6
    assert abs(grid[3, 1, 2] - 0.25) < 1e-6
    assert abs(grid[0, 0, 0] - 1.0) < 1e-6
    assert abs(grid[3, 0, 0] + 1.0) < 1e-6


def test_empty_events():
    grid = events_to_voxel_grid_np(np.zeros((0, 4)), num_bins=5, width=4, height=3)
    assert grid.shape == (5, 3, 4)
    assert np.all(grid == 0)
    args = _to_device_args(np.zeros((0, 4)), capacity=8)
    got = np.asarray(
        events_to_voxel_grid(*args, num_bins=5, width=4, height=3, method="sort")
    )
    np.testing.assert_array_equal(got, grid)


def test_delta_t_zero_guard():
    events = np.array([[2.0, 0, 0, 1], [2.0, 1, 1, 1]], dtype=np.float64)
    grid = events_to_voxel_grid_np(events, num_bins=5, width=2, height=2)
    # all ts -> 0 -> bin 0
    assert grid[0, 0, 0] == 1.0 and grid[0, 1, 1] == 1.0


@pytest.mark.parametrize("method", ["sort", "scatter"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_matches_numpy_oracle(method, seed):
    rng = np.random.default_rng(seed)
    n, h, w, nb = 700, 12, 17, 5
    t = np.sort(rng.uniform(0.0, 0.05, n))
    x = rng.integers(0, w, n)
    y = rng.integers(0, h, n)
    p = rng.choice([0.0, 1.0, -1.0], n)
    events = np.stack([t, x, y, p], axis=1)
    want = events_to_voxel_grid_np(events, num_bins=nb, width=w, height=h)

    args = _to_device_args(events, capacity=1024)
    got = np.asarray(
        events_to_voxel_grid(*args, num_bins=nb, width=w, height=h, method=method)
    )
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_preprocess_std_normalizes_nonzero():
    rng = np.random.default_rng(0)
    v = np.zeros((5, 6, 6), np.float32)
    mask = rng.random(v.shape) < 0.3
    v[mask] = rng.normal(3.0, 2.0, mask.sum()).astype(np.float32)
    out = event_preprocess_np(v, mode="std")
    nz = out[out != 0]
    assert abs(nz.mean()) < 0.15  # zeros created by normalization shift excluded
    # device version agrees with host version
    out_dev = np.asarray(event_preprocess(jnp.asarray(v), mode="std"))
    np.testing.assert_allclose(out_dev, out, atol=1e-5)


def test_preprocess_hot_pixel_filter():
    v = np.zeros((5, 4, 4), np.float32)
    v[0, 0, 0] = 100.0  # hot pixel, > 25/5
    v[1, 1, 1] = 1.0
    out = event_preprocess_np(v, mode="std", filter_hot_pixel=True)
    assert out[0, 0, 0] == 0.0
    out_dev = np.asarray(
        event_preprocess(jnp.asarray(v), mode="std", filter_hot_pixel=True)
    )
    assert out_dev[0, 0, 0] == 0.0


def test_preprocess_std_is_per_sample():
    """Batched normalization == stacking per-sample normalizations: one
    sample's event statistics must not rescale another's grid (the reference
    normalizes each grid independently; batch-size invariance on TPU)."""
    rng = np.random.default_rng(3)
    v = rng.normal(0.0, 2.0, (4, 5, 6, 6)).astype(np.float32)
    v[rng.random(v.shape) < 0.6] = 0.0
    v[2] *= 10.0  # an outlier sample must not perturb the others
    batched = np.asarray(event_preprocess(jnp.asarray(v), mode="std"))
    singly = np.stack(
        [np.asarray(event_preprocess(jnp.asarray(s), mode="std")) for s in v]
    )
    np.testing.assert_allclose(batched, singly, atol=1e-6)


def test_preprocess_all_zero_is_identity():
    v = np.zeros((5, 4, 4), np.float32)
    out = event_preprocess_np(v, mode="std")
    np.testing.assert_array_equal(out, v)
    out_dev = np.asarray(event_preprocess(jnp.asarray(v), mode="std"))
    np.testing.assert_array_equal(out_dev, v)


@pytest.mark.parametrize("method", ["sort", "scatter"])
def test_parity_layout_is_space_to_depth_of_ref(method):
    """layout='parity' == space_to_depth of the reference grid (NHWC)."""
    from v2e2v_tpu.ops.fused import space_to_depth

    rng = np.random.default_rng(7)
    n, h, w, nb = 900, 12, 16, 5
    t = np.sort(rng.uniform(0.0, 0.05, n))
    x = rng.integers(0, w, n)
    y = rng.integers(0, h, n)
    p = rng.choice([0.0, 1.0, -1.0], n)
    events = np.stack([t, x, y, p], axis=1)
    args = _to_device_args(events, capacity=1024)

    ref = events_to_voxel_grid(
        *args, num_bins=nb, width=w, height=h, method=method
    )
    par = events_to_voxel_grid(
        *args, num_bins=nb, width=w, height=h, method=method, layout="parity"
    )
    # ref grid is [nb, H, W]; NHWC view is transpose(1, 2, 0). 'scatter'
    # accumulates per cell in event order under both layouts -> bit-equal;
    # 'sort' prefix-sums in flat-index order, which the layout permutes ->
    # f32 summation-order noise only.
    want = space_to_depth(jnp.transpose(ref, (1, 2, 0))[None])[0]
    if method == "scatter":
        np.testing.assert_array_equal(np.asarray(par), np.asarray(want))
    else:
        np.testing.assert_allclose(
            np.asarray(par), np.asarray(want), atol=2e-4
        )


def test_cista_sequence_input_packed_matches_unpacked():
    import jax

    from v2e2v_tpu.models.cista import (
        CistaConfig,
        cista_sequence,
        init_cista_lstc,
    )
    from v2e2v_tpu.ops.fused import space_to_depth

    cfg = CistaConfig(image_dim=(16, 24), base_channels=16, depth=2, num_bins=5)
    cfgp = CistaConfig(
        image_dim=(16, 24), base_channels=16, depth=2, num_bins=5,
        io_layout="parity",
    )
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(8)
    seq = jnp.asarray(rng.normal(size=(3, 2, 16, 24, 5)).astype(np.float32))
    seqp = space_to_depth(seq.reshape(6, 16, 24, 5)).reshape(3, 2, 8, 12, 20)

    r0, _ = cista_sequence(params, cfg, seq)
    r1, _ = cista_sequence(params, cfgp, seqp, input_packed=True)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), atol=2e-5)

    with pytest.raises(ValueError):
        cista_sequence(params, cfg, seq, input_packed=True)
