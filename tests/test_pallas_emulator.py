"""Pallas emulator-iterations kernel vs a plain-jnp reference of the same
semantics (interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2e2v_tpu.ops.pallas.emulator_iters import emulator_iters_pallas


def _reference(counts, pol, mem, trf, om, off, rand01, ts_step, num_iters,
               gate, tf_base, num_bins, max_iters, shot):
    """Mirror of the XLA path in models/emulator.py::pair_step_exact."""
    b, h, w = counts.shape
    iters = jnp.arange(max_iters, dtype=jnp.int32)
    cand = counts[None] >= (iters[:, None, None, None] + 1)
    if shot:
        s = jnp.where(pol[None] > 0, rand01 > om[None], False) | jnp.where(
            pol[None] < 0, rand01 < off[None], False
        )
        active = iters[:, None] < num_iters[None, :]
        cand = cand | (s & active[:, :, None, None])
    ts_all = jnp.where(
        iters[:, None] < num_iters[None, :],
        tf_base + ts_step[None, :] * (iters[:, None] + 1.0),
        0.0,
    )
    gate3 = gate[:, None, None]

    def body(mem, inp):
        cand_i, ts_i = inp
        ts_map = jnp.broadcast_to(ts_i[:, None, None], (b, h, w))
        m = cand_i & jnp.where(gate3, (ts_map - mem) > trf, True)
        mem = jnp.where(m & gate3, ts_map, mem)
        return mem, m

    mem_out, masks = jax.lax.scan(body, mem, (cand, ts_all))
    final = jnp.sum(masks, axis=0, dtype=jnp.int32)
    bins = jnp.arange(num_bins, dtype=jnp.float32)
    wgt = jnp.maximum(0.0, 1.0 - jnp.abs(ts_all[..., None] - bins))
    evmap = pol[None] * masks
    voxel = jnp.einsum("ibhw,ibn->bhwn", evmap, wgt)
    return voxel, mem_out, final


@pytest.mark.parametrize("shot", [True, False])
@pytest.mark.parametrize("gate_on", [True, False])
def test_kernel_matches_reference(shot, gate_on):
    b, h, w, nb, mi = 2, 16, 24, 5, 8
    rng = np.random.default_rng(0 if shot else 1)
    counts = jnp.asarray(rng.integers(0, 7, (b, h, w)).astype(np.int32))
    pol = jnp.asarray(rng.choice([-1.0, 0.0, 1.0], (b, h, w)).astype(np.float32))
    mem = jnp.asarray(rng.uniform(-1, 0, (b, h, w)).astype(np.float32))
    trf = jnp.full((b, h, w), 0.7, jnp.float32)
    om = jnp.asarray(rng.uniform(0.95, 1.0, (b, h, w)).astype(np.float32))
    off = jnp.asarray(rng.uniform(0.0, 0.05, (b, h, w)).astype(np.float32))
    rand01 = jnp.asarray(rng.uniform(0, 1, (mi, b, h, w)).astype(np.float32))
    num_iters = jnp.asarray([6, 4], jnp.int32)
    ts_step = 4.0 / num_iters.astype(jnp.float32)
    gate = jnp.asarray([gate_on, gate_on])
    tf_base = jnp.asarray(1.0, jnp.float32)

    seed = jnp.zeros((b,), jnp.int32)
    got = emulator_iters_pallas(
        counts, pol, mem, trf, om, off, rand01, seed, ts_step, num_iters,
        gate, tf_base, num_bins=nb, max_iters=mi, shot=shot, interpret=True,
    )
    want = _reference(
        counts, pol, mem, trf, om, off, rand01, ts_step, num_iters, gate,
        tf_base, nb, mi, shot,
    )
    for g, w_, name in zip(got, want, ("voxel", "mem", "final")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w_), atol=1e-5, err_msg=name
        )


def test_emulate_pack_pallas_matches_xla():
    """Full emulate_pack: forced-pallas (interpret) must bit-match the XLA
    path — identical key schedule, masks, voxel, state."""
    import dataclasses

    from v2e2v_tpu.models.emulator import EmulatorConfig, emulate_pack

    h, w, n = 12, 16, 5
    rng = np.random.default_rng(3)
    base = rng.uniform(40, 150, (h, w)).astype(np.float32)
    rate = rng.uniform(0.02, 0.3, (h, w)).astype(np.float32)
    frames = np.clip(
        np.stack([base * (1 + rate * i) for i in range(n)], 0)[None], 0, 255
    )
    t = np.linspace(0, 0.004, n, dtype=np.float32)[None]
    kw = dict(pos_thres=0.2, neg_thres=0.2, sigma_thres=0.03,
              refractory_period_s=0.001, leak_rate_hz=0.1,
              shot_noise_rate_hz=100.0)
    key = jax.random.PRNGKey(42)

    outs = {}
    for impl in ("xla", "pallas"):
        cfg = EmulatorConfig(**kw, iters_impl=impl)
        v, n_ev, st = emulate_pack(cfg, None, jnp.asarray(frames), jnp.asarray(t), key=key)
        v2, n_ev2, st2 = emulate_pack(cfg, st, jnp.asarray(frames * 1.1), jnp.asarray(t + 0.004))
        outs[impl] = (np.asarray(v), int(n_ev), np.asarray(v2), int(n_ev2),
                      np.asarray(st2.base_log_frame), np.asarray(st2.timestamp_mem))

    for a, b_ in zip(outs["xla"], outs["pallas"]):
        if isinstance(a, int):
            assert a == b_
        else:
            np.testing.assert_allclose(a, b_, atol=1e-5)
