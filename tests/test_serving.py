"""StreamPool: isolation between streams, attach/detach slot reuse."""

import jax
import jax.numpy as jnp
import numpy as np

from v2e2v_tpu.models.cista import (
    CistaConfig,
    cista_lstc_step,
    cista_zero_state,
    init_cista_lstc,
)
from v2e2v_tpu.serving import StreamPool

H, W, NB = 16, 20, 5


def _pool(capacity=4):
    cfg = CistaConfig(image_dim=(H, W), base_channels=8, depth=2, num_bins=NB)
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    return cfg, params, StreamPool(cfg, params, capacity=capacity, dtype=jnp.float32)


def _vox(seed):
    return np.random.default_rng(seed).normal(size=(H, W, NB)).astype(np.float32)


def test_pool_matches_single_stream_sequence():
    cfg, params, pool = _pool()
    sid = pool.attach()

    state = cista_zero_state(cfg, 1)
    prev = jnp.zeros((1, H, W, 1))
    for i in range(3):
        vox = _vox(i)
        out = pool.step({sid: vox})[sid]
        rec, state = cista_lstc_step(params, cfg, jnp.asarray(vox)[None], prev, state)
        prev = rec
        np.testing.assert_allclose(out, np.asarray(rec[0, ..., 0]), atol=1e-5)


def test_streams_are_isolated():
    """Stepping stream B must not perturb idle stream A's state."""
    _, _, pool = _pool()
    a = pool.attach()
    b = pool.attach()

    out_a1 = pool.step({a: _vox(0)})[a]
    # step b twice while a idles
    pool.step({b: _vox(1)})
    pool.step({b: _vox(2)})
    out_a2 = pool.step({a: _vox(3)})[a]

    # reference: a alone in a fresh pool
    _, _, solo = _pool()
    s = solo.attach()
    ref1 = solo.step({s: _vox(0)})[s]
    ref2 = solo.step({s: _vox(3)})[s]
    np.testing.assert_allclose(out_a1, ref1, atol=1e-5)
    np.testing.assert_allclose(out_a2, ref2, atol=1e-5)


def test_detach_reuses_slot_with_fresh_state():
    _, _, pool = _pool(capacity=1)
    a = pool.attach()
    out_a = pool.step({a: _vox(0)})[a]
    pool.detach(a)

    b = pool.attach()  # reuses the slot
    out_b = pool.step({b: _vox(0)})[b]
    np.testing.assert_allclose(out_b, out_a, atol=1e-5)  # fresh state, same input


def test_pool_capacity_enforced():
    import pytest

    _, _, pool = _pool(capacity=2)
    pool.attach()
    pool.attach()
    with pytest.raises(RuntimeError, match="full"):
        pool.attach()


def test_pool_int8_tracks_float():
    """A quant='int8' pool steps through the quantized core (ops/qconv) and
    stays near the float pool on the same stream — the serving-side wiring
    of CistaConfig.quant (params['_quant'] injected once at pool build)."""
    cfg = CistaConfig(image_dim=(H, W), base_channels=8, depth=2, num_bins=NB)
    cfg_q = CistaConfig(
        image_dim=(H, W), base_channels=8, depth=2, num_bins=NB, quant="int8"
    )
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    pool_f = StreamPool(cfg, params, capacity=2, dtype=jnp.float32)
    pool_q = StreamPool(cfg_q, params, capacity=2, dtype=jnp.float32)
    assert "_quant" in pool_q.params and "_quant" not in pool_f.params

    a = pool_f.attach()
    b = pool_q.attach()
    for i in range(3):
        vox = _vox(i)
        out_f = pool_f.step({a: vox})[a]
        out_q = pool_q.step({b: vox})[b]
        # sigmoid outputs in [0,1]; int8 rounding stays small through the
        # recurrence (same budget as tests/test_qconv.py)
        assert np.mean(np.abs(out_q - out_f)) < 0.05


def test_pool_mesh_sharded_matches_single_device():
    """A pool with slots sharded over a 4-way data mesh must produce the
    SAME outputs as the unsharded pool (params replicated, states/voxels
    P('data')) — the multi-chip serving path, on virtual CPU devices."""
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from v2e2v_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    cfg = CistaConfig(image_dim=(H, W), base_channels=8, depth=2, num_bins=NB)
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    pool_1 = StreamPool(cfg, params, capacity=4, dtype=jnp.float32)
    pool_m = StreamPool(cfg, params, capacity=4, dtype=jnp.float32, mesh=mesh)

    sids_1 = [pool_1.attach() for _ in range(4)]
    sids_m = [pool_m.attach() for _ in range(4)]
    for i in range(3):
        feed = {s: _vox(10 * i + j) for j, s in enumerate(sids_1)}
        feed_m = {s: _vox(10 * i + j) for j, s in enumerate(sids_m)}
        out_1 = pool_1.step(feed)
        out_m = pool_m.step(feed_m)
        for s1, sm in zip(sids_1, sids_m):
            np.testing.assert_allclose(out_m[sm], out_1[s1], atol=1e-5)
    # detach/attach keeps working against sharded state
    pool_m.detach(sids_m[0])
    fresh = pool_m.attach()
    out = pool_m.step({fresh: _vox(0)})[fresh]
    assert np.isfinite(out).all()


def test_pool_mesh_capacity_divisibility():
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from v2e2v_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    cfg = CistaConfig(image_dim=(H, W), base_channels=8, depth=2, num_bins=NB)
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="divisible"):
        StreamPool(cfg, params, capacity=6, dtype=jnp.float32, mesh=mesh)


def test_pool_supports_cista_tc():
    """StreamPool routes through get_step_fn: a cista-tc pool must step and
    match the direct cista_tc_step recurrence."""
    from v2e2v_tpu.models.cista import cista_tc_step, init_cista_tc

    cfg = CistaConfig(
        image_dim=(H, W), base_channels=8, depth=2, num_bins=NB,
        model_mode="cista-tc",
    )
    params = init_cista_tc(jax.random.PRNGKey(0), cfg)
    pool = StreamPool(cfg, params, capacity=2, dtype=jnp.float32)
    sid = pool.attach()

    state = cista_zero_state(cfg, 1)
    prev = jnp.zeros((1, H, W, 1))
    for i in range(2):
        vox = _vox(i)
        out = pool.step({sid: vox})[sid]
        rec, state = cista_tc_step(params, cfg, jnp.asarray(vox)[None], prev, state)
        prev = rec
        np.testing.assert_allclose(out, np.asarray(rec[0, ..., 0]), atol=1e-5)


def test_pool_int8_static_calibration_tracks_dynamic():
    """StreamPool.calibrate() installs static activation scales; subsequent
    steps skip the dynamic abs-max and stay near the dynamic-int8 pool on
    the calibration distribution."""
    cfg_q = CistaConfig(
        image_dim=(H, W), base_channels=8, depth=2, num_bins=NB, quant="int8"
    )
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg_q)
    pool_dyn = StreamPool(cfg_q, params, capacity=2, dtype=jnp.float32)
    pool_sta = StreamPool(cfg_q, params, capacity=2, dtype=jnp.float32)

    calib = jnp.stack(
        [jnp.asarray(_vox(100 + i))[None] for i in range(2)]
    )  # [2 steps, 1, H, W, NB]
    pool_sta.calibrate(calib)
    assert "s_x" in pool_sta.params["_quant"]["D"]
    assert "s_x" not in pool_dyn.params["_quant"]["D"]

    a = pool_dyn.attach()
    b = pool_sta.attach()
    for i in range(3):
        vox = _vox(i)
        out_d = pool_dyn.step({a: vox})[a]
        out_s = pool_sta.step({b: vox})[b]
        assert np.mean(np.abs(out_s - out_d)) < 0.02
