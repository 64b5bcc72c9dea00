"""V2E2V composite: wiring, state threading, gradient flow to e2v params."""

import jax
import jax.numpy as jnp
import numpy as np

from v2e2v_tpu.models.cista import CistaConfig, init_cista_lstc
from v2e2v_tpu.models.emulator import EmulatorConfig
from v2e2v_tpu.models.v2e2v import V2E2VConfig, v2e2v_forward

H, W, N = 16, 16, 5


def _cfg():
    return V2E2VConfig(
        cista=CistaConfig(image_dim=(H, W), base_channels=8, depth=2, num_bins=5),
        emulator=EmulatorConfig(
            pos_thres=0.2, neg_thres=0.2, sigma_thres=0.03,
            leak_rate_hz=0.1, shot_noise_rate_hz=1.0,
        ),
    )


def _frames(seed=0):
    # spatially-varying growth rates so event counts/timestamps differ per
    # pixel (a uniform ramp makes every voxel entry identical, which the
    # zero-mean/unit-std normalization degenerately maps to all zeros)
    rng = np.random.default_rng(seed)
    base = rng.uniform(40, 150, (H, W)).astype(np.float32)
    rate = rng.uniform(0.02, 0.25, (H, W)).astype(np.float32)
    f = np.clip(
        np.stack([base * (1 + rate * i) for i in range(N)], 0)[None], 0, 255
    )
    return jnp.asarray(f)


def test_forward_and_state_threading():
    cfg = _cfg()
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg.cista)
    t1 = jnp.asarray(np.linspace(0, 0.03, N, dtype=np.float32)[None])

    out1, state = v2e2v_forward(
        params, cfg, _frames(0), t1, None, key=jax.random.PRNGKey(1)
    )
    assert out1.reconstruction.shape == (1, H, W, 1)
    assert out1.event_voxel_grids.shape == (1, H, W, 5)
    assert int(out1.num_events) > 0

    out2, state2 = v2e2v_forward(params, cfg, _frames(1), t1 + 0.03, state)
    # prev image feedback: second step must differ from a fresh-state run
    out2_fresh, _ = v2e2v_forward(
        params, cfg, _frames(1), t1 + 0.03, None, key=jax.random.PRNGKey(1)
    )
    assert not np.allclose(
        np.asarray(out2.reconstruction), np.asarray(out2_fresh.reconstruction)
    )


def test_gradient_reaches_e2v_params_only():
    """V2E2V training updates the e2v net through the emulated voxel grids;
    the emulator has no trainable parameters (reference: thresholds are not
    nn.Parameters) and its outputs are stop_gradient'ed."""
    cfg = _cfg()
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg.cista)
    t1 = jnp.asarray(np.linspace(0, 0.03, N, dtype=np.float32)[None])
    frames = _frames(2)
    gt = jax.random.uniform(jax.random.PRNGKey(3), (1, H, W, 1))

    def loss_fn(p):
        out, _ = v2e2v_forward(p, cfg, frames, t1, None, key=jax.random.PRNGKey(1))
        rec = jnp.clip(out.reconstruction, 1e-7, 1 - 1e-7)
        return jnp.mean(jnp.abs(rec - gt))

    g = jax.jit(jax.grad(loss_fn))(params)
    assert float(jnp.abs(g["We"]["weight"]).max()) > 0
    assert all(
        np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g)
    )


def test_from_flags_applies_hardcoded_noise():
    import argparse

    from v2e2v_tpu.utils.configs import set_configs

    parser = argparse.ArgumentParser()
    set_configs(parser)
    cfgs = parser.parse_args([])
    cfg = V2E2VConfig.from_flags(cfgs)
    assert cfg.emulator.leak_rate_hz == 0.1
    assert cfg.emulator.shot_noise_rate_hz == 1.0
    assert cfg.cista.image_dim == (180, 240)


def test_sequence_scan_matches_python_unroll():
    """The lax.scan BPTT window must equal the python-unrolled composite
    (same init key, same packs) — value parity for the compile-once path."""
    from v2e2v_tpu.models.v2e2v import v2e2v_sequence

    cfg = _cfg()
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg.cista)
    key = jax.random.PRNGKey(7)

    t_steps = 3
    frames_seq = jnp.stack([_frames(i) for i in range(t_steps)], 0)  # [T,1,N,H,W]
    ts_seq = jnp.stack(
        [jnp.asarray(np.linspace(0, 0.03, N, dtype=np.float32)[None]) + 0.03 * i
         for i in range(t_steps)],
        0,
    )

    recs_scan, state_scan = v2e2v_sequence(params, cfg, frames_seq, ts_seq, key)

    state = None
    recs_loop = []
    for s in range(t_steps):
        out, state = v2e2v_forward(
            params, cfg, frames_seq[s], ts_seq[s], state, key=key
        )
        recs_loop.append(out.reconstruction)
    np.testing.assert_allclose(
        np.asarray(recs_scan), np.asarray(jnp.stack(recs_loop, 0)), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(state_scan.prev_image), np.asarray(state.prev_image), atol=1e-6
    )


def test_sequence_scan_grad_matches_unroll():
    from v2e2v_tpu.models.v2e2v import v2e2v_sequence

    cfg = _cfg()
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg.cista)
    key = jax.random.PRNGKey(7)
    t_steps = 2
    frames_seq = jnp.stack([_frames(i) for i in range(t_steps)], 0)
    ts_seq = jnp.stack(
        [jnp.asarray(np.linspace(0, 0.03, N, dtype=np.float32)[None]) + 0.03 * i
         for i in range(t_steps)],
        0,
    )
    gt = jnp.asarray(np.random.default_rng(0).random((1, H, W, 1), np.float32))

    def loss_scan(p):
        recs, _ = v2e2v_sequence(p, cfg, frames_seq, ts_seq, key)
        return jnp.mean((recs[-1] - gt) ** 2)

    def loss_loop(p):
        state, out = None, None
        for s in range(t_steps):
            out, state = v2e2v_forward(p, cfg, frames_seq[s], ts_seq[s], state, key=key)
        return jnp.mean((out.reconstruction - gt) ** 2)

    # jit the grads: compiled execution + persistent-cache hits on warm
    # reruns (the unrolled BPTT grad is the suite's biggest program)
    g_scan = jax.jit(jax.grad(loss_scan))(params)
    g_loop = jax.jit(jax.grad(loss_loop))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        g_scan, g_loop,
    )


def test_sequence_with_stats_surfaces_saturation():
    """with_stats returns per-pack saturation scalars; a tiny max_iters
    must report clipped pixels and the PRE-clip max event count (the
    reference's per-pixel loop is unbounded, ``v2e/v2e_model.py:449``)."""
    from dataclasses import replace

    from v2e2v_tpu.models.v2e2v import v2e2v_sequence

    cfg = _cfg()
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg.cista)
    t = 3
    frames_seq = jnp.stack([_frames(seed=i) for i in range(t)], 0)
    ts = jnp.linspace(0.0, 0.004 * (N - 1), N, dtype=jnp.float32)[None]
    ts_seq = jnp.stack([ts + i * 0.004 * (N - 1) for i in range(t)], 0)
    key = jax.random.PRNGKey(3)

    recs, _, stats = v2e2v_sequence(
        params, cfg, frames_seq, ts_seq, key, with_stats=True
    )
    assert set(stats) == {"num_events", "max_event_count", "clipped_pixels"}
    assert stats["num_events"].shape == (t,)
    assert int(stats["clipped_pixels"].sum()) == 0  # max_iters=32 is ample

    # clip hard: max_iters=1 must flag pixels whose count exceeds the bound
    cfg_clip = replace(cfg, emulator=replace(cfg.emulator, max_iters=1, unroll_iters=1))
    _, _, stats_clip = v2e2v_sequence(
        params, cfg_clip, frames_seq, ts_seq, key, with_stats=True
    )
    assert int(stats_clip["clipped_pixels"].sum()) > 0
    assert int(stats_clip["max_event_count"].max()) > 1
    # pre-clip max count is a property of the data, not of max_iters
    assert int(stats_clip["max_event_count"].max()) == int(
        stats["max_event_count"].max()
    )


def test_sequence_with_monitor_includes_stats_dict():
    from v2e2v_tpu.models.v2e2v import v2e2v_sequence

    cfg = _cfg()
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg.cista)
    frames_seq = jnp.stack([_frames(seed=i) for i in range(2)], 0)
    ts = jnp.linspace(0.0, 0.004 * (N - 1), N, dtype=jnp.float32)[None]
    ts_seq = jnp.stack([ts + i * 0.004 * (N - 1) for i in range(2)], 0)

    recs, _, (voxels, stats) = v2e2v_sequence(
        params, cfg, frames_seq, ts_seq, jax.random.PRNGKey(5), with_monitor=True
    )
    assert voxels.shape == (2, 1, H, W, 5)
    assert stats["num_events"].shape == (2,)
