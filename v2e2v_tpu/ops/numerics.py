"""DVS emulator numerics, TPU-first.

Behavioral spec from the reference implementation ``v2e/emulator_utils.py``
(lsying009/V2E2V): lin-log intensity mapping (:13-37), intensity rescaling
(:40-45), per-pixel intensity-dependent first-order IIR lowpass with the
interleaved ``[0::2, 0::2]`` "sensing diversity" lattice (:48-102), and the
jittered log-normal leak current (:105-125).

All functions here are pure, fp32, static-shape, and jit-safe. Randomness is
threaded through explicit ``jax.random`` keys.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

LIN_LOG_THRESHOLD = 20.0


def lin_log(x: jax.Array, threshold: float = LIN_LOG_THRESHOLD) -> jax.Array:
    """Linear-below-threshold / log-above-threshold intensity mapping.

    The reference (``emulator_utils.py:13-37``) computes in float64 and rounds
    the result to 1e-8 before casting to float32, so that adding and
    subtracting a contrast threshold round-trips exactly. In float32 the cast
    itself quantizes more coarsely than the 1e-8 rounding (eps(log 255) ~
    4.8e-7), so this fp32 version agrees with the reference to <= 1 ulp; the
    explicit rounding is kept for the linear branch where it is representable.
    """
    x = x.astype(jnp.float32)
    f = math.log(threshold) / threshold
    y = jnp.where(x <= threshold, x * f, jnp.log(jnp.maximum(x, 1e-12)))
    rounding = 1e8
    return jnp.round(y * rounding) / rounding


def lin_log_np(x: np.ndarray, threshold: float = LIN_LOG_THRESHOLD) -> np.ndarray:
    """Float64 host version with exact reference rounding semantics."""
    x = np.asarray(x, dtype=np.float64)
    f = math.log(threshold) / threshold
    with np.errstate(divide="ignore"):
        y = np.where(x <= threshold, x * f, np.log(x))
    rounding = 1e8
    y = np.round(y * rounding) / rounding
    return y.astype(np.float32)


def rescale_intensity_frame(frame: jax.Array) -> jax.Array:
    """Rescale a 0-255 intensity frame to a strictly positive [~0.07, 1] range.

    Matches ``emulator_utils.py:40-45``: ``(I + 20) / 275`` — avoids zero time
    constants and limits the max time constant to ~1/10 of white level.
    """
    return (frame + 20.0) / 275.0


def _diversity_lattice_mask(shape: tuple[int, ...]) -> jax.Array:
    """Boolean mask selecting the ``[..., 0::2, 0::2]`` pixel lattice.

    The reference applies "sensing diversity" by overwriting every other pixel
    in both spatial dims (``emulator_utils.py:87-89``, ``v2e_model.py:194``).
    The trailing two dims of ``shape`` are (H, W).
    """
    h, w = shape[-2], shape[-1]
    hh = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) % 2) == 0
    ww = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) % 2) == 0
    mask = jnp.logical_and(hh, ww)
    return jnp.broadcast_to(mask, shape)


def low_pass_filter_step(
    log_new_frame: jax.Array,
    lp_log_frame: jax.Array,
    inten01: jax.Array,
    delta_time: jax.Array,
    cutoff_hz: float,
    ql: float = 1.0,
    qs: float = 1.0,
) -> jax.Array:
    """One step of the intensity-dependent first-order IIR lowpass.

    Matches ``emulator_utils.py:48-102``. The update coefficient is
    ``eps = inten01 * dt / tau`` with ``tau = 1 / (2 pi fc q)``; the
    ``[0::2, 0::2]`` lattice uses ``qs`` (or eps=1 when qs<=0), the rest uses
    ``ql`` (or eps=1 when ql<=0); eps is clamped to <= 1 for stability.

    ``cutoff_hz`` must be a static python float: when <= 0 the input is
    returned unfiltered (reference behavior, and lets jit elide the filter).
    """
    if cutoff_hz <= 0:
        return log_new_frame

    if ql > 0:
        tau_l = 1.0 / (math.pi * 2 * cutoff_hz * ql)
        eps_l = inten01 * (delta_time / tau_l)
    else:
        eps_l = jnp.ones_like(inten01)
    if qs > 0:
        tau_s = 1.0 / (math.pi * 2 * cutoff_hz * qs)
        eps_s = inten01 * (delta_time / tau_s)
    else:
        eps_s = jnp.ones_like(inten01)

    lattice = _diversity_lattice_mask(log_new_frame.shape)
    eps = jnp.where(lattice, eps_s, eps_l)
    eps = jnp.minimum(eps, 1.0)
    return (1.0 - eps) * lp_log_frame + eps * log_new_frame


def subtract_leak_current(
    key: jax.Array,
    base_log_frame: jax.Array,
    leak_rate_hz: float,
    delta_time: jax.Array,
    pos_thres: jax.Array,
    leak_jitter_fraction: float,
    noise_rate_array: jax.Array,
) -> jax.Array:
    """Subtract jittered leak current from the memorized log frame.

    Matches ``emulator_utils.py:105-125``: per-pixel leak rate is
    ``leak_rate_hz * noise_rate_array * (1 - jitter * N(0,1))`` and the
    decrement is ``dt * rate * pos_thres``.
    """
    rand = jax.random.normal(key, noise_rate_array.shape, dtype=jnp.float32)
    curr_leak_rate = leak_rate_hz * noise_rate_array * (1.0 - leak_jitter_fraction * rand)
    delta_leak = delta_time * curr_leak_rate * pos_thres
    return base_log_frame - delta_leak


def softshrink(x: jax.Array, lambd: jax.Array) -> jax.Array:
    """Soft-thresholding: ``relu(x - l) - relu(-x - l)``.

    The ISTA shrinkage nonlinearity (``e2v/base_layers.py:11-12``); ``lambd``
    is a learned per-channel parameter broadcast over NHWC activations.
    """
    return jax.nn.relu(x - lambd) - jax.nn.relu(-x - lambd)
