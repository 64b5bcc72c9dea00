import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2e2v_tpu.ops.numerics import (
    lin_log,
    lin_log_np,
    low_pass_filter_step,
    rescale_intensity_frame,
    softshrink,
    subtract_leak_current,
)


def test_lin_log_matches_f64_reference():
    x = np.linspace(0.0, 255.0, 1001, dtype=np.float32)
    got = np.asarray(lin_log(jnp.asarray(x)))
    want = lin_log_np(x)
    np.testing.assert_allclose(got, want, atol=5e-7, rtol=1e-6)


def test_lin_log_branches_and_continuity():
    # linear branch: y = x * log(20)/20
    x = np.array([0.0, 5.0, 20.0], dtype=np.float32)
    y = lin_log_np(x)
    f = np.log(20.0) / 20.0
    np.testing.assert_allclose(y, x * f, atol=1e-7)
    # log branch
    np.testing.assert_allclose(lin_log_np(np.array([100.0])), np.log(100.0), atol=1e-7)
    # continuity at threshold
    assert abs(lin_log_np(np.array([20.0]))[0] - np.log(20.0)) < 1e-7


def test_rescale_intensity_frame():
    x = jnp.array([0.0, 255.0])
    got = rescale_intensity_frame(x)
    np.testing.assert_allclose(np.asarray(got), [20.0 / 275.0, 1.0], atol=1e-7)


def test_low_pass_filter_passthrough_when_cutoff_zero():
    x = jnp.ones((1, 4, 4)) * 3.0
    lp = jnp.zeros((1, 4, 4))
    out = low_pass_filter_step(x, lp, jnp.ones_like(x), 0.1, cutoff_hz=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_low_pass_filter_interleave_lattice():
    """qs=0 forces eps=1 on the [0::2,0::2] lattice -> output = new frame there."""
    h, w = 4, 6
    new = jnp.full((1, h, w), 2.0)
    lp = jnp.zeros((1, h, w))
    inten = jnp.full((1, h, w), 0.5)
    out = np.asarray(
        low_pass_filter_step(new, lp, inten, 1e-4, cutoff_hz=200.0, ql=1.0, qs=0.0)
    )
    # lattice pixels fully updated
    np.testing.assert_allclose(out[0, 0::2, 0::2], 2.0, atol=1e-6)
    # non-lattice pixels partially updated with eps = inten * dt * 2*pi*fc*ql
    eps = 0.5 * 1e-4 * (np.pi * 2 * 200.0)
    np.testing.assert_allclose(out[0, 1::2, 1::2], eps * 2.0, rtol=1e-5)


def test_low_pass_filter_eps_clamped():
    new = jnp.full((1, 2, 2), 5.0)
    lp = jnp.full((1, 2, 2), -1.0)
    inten = jnp.ones((1, 2, 2))
    # enormous dt -> eps clamps to 1 -> output == new frame
    out = low_pass_filter_step(new, lp, inten, 100.0, cutoff_hz=200.0)
    np.testing.assert_allclose(np.asarray(out), 5.0, atol=1e-6)


def test_subtract_leak_current_no_jitter():
    key = jax.random.PRNGKey(0)
    base = jnp.full((1, 3, 3), 10.0)
    noise_rate = jnp.full((1, 3, 3), 2.0)
    pos_thres = jnp.full((1, 3, 3), 0.2)
    out = subtract_leak_current(
        key, base, leak_rate_hz=0.5, delta_time=0.1, pos_thres=pos_thres,
        leak_jitter_fraction=0.0, noise_rate_array=noise_rate,
    )
    want = 10.0 - 0.1 * (0.5 * 2.0) * 0.2
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)


def test_softshrink():
    x = jnp.array([-2.0, -0.5, 0.0, 0.5, 2.0])
    lam = jnp.array(1.0)
    got = np.asarray(softshrink(x, lam))
    np.testing.assert_allclose(got, [-1.0, 0.0, 0.0, 0.0, 1.0], atol=1e-7)


def test_softshrink_per_channel_lambda_broadcast():
    x = jnp.ones((2, 4, 4, 3)) * 0.5
    lam = jnp.array([0.0, 0.25, 1.0])
    got = np.asarray(softshrink(x, lam))
    np.testing.assert_allclose(got[..., 0], 0.5, atol=1e-7)
    np.testing.assert_allclose(got[..., 1], 0.25, atol=1e-7)
    np.testing.assert_allclose(got[..., 2], 0.0, atol=1e-7)
