"""Training losses, TPU-first.

The reference training loss is ``LPIPS(vgg) + L1 + (1 - SSIM)`` computed on
the final reconstruction of each sequence ("many-to-one",
``train_e2v.py:117-120``). SSIM there is ``pytorch_msssim.SSIM(data_range=1,
channel=1)`` — a gaussian-window (11, sigma 1.5) SSIM. LPIPS lives in
``v2e2v_tpu.training.lpips_jax`` (VGG16 weights convert from torch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel1d(win_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    half = win_size // 2
    coords = np.arange(-half, half + 1, dtype=np.float64)
    g = np.exp(-(coords**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _gaussian_blur(x: jax.Array, win_size: int, sigma: float) -> jax.Array:
    """Separable depthwise gaussian filter on NHWC, VALID padding.

    precision=HIGHEST is load-bearing: SSIM computes variances as
    ``blur(x^2) - mu^2``, a catastrophic cancellation. TPU's default conv
    precision truncates mantissas, which on near-constant windows makes the
    variance garbage at the scale of the C2 stabilizer — SSIM then leaves
    [-1, 1] and its gradient turns to noise (observed: training diverged on
    TPU while converging on CPU).
    """
    c = x.shape[-1]
    k = jnp.asarray(_gaussian_kernel1d(win_size, sigma))
    kh = jnp.tile(k.reshape(win_size, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k.reshape(1, win_size, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, kh.astype(x.dtype), (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST,
    )
    y = jax.lax.conv_general_dilated(
        y, kw.astype(x.dtype), (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST,
    )
    return y


def ssim(
    img1: jax.Array,
    img2: jax.Array,
    data_range: float = 1.0,
    win_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Gaussian-window SSIM on NHWC images (pytorch_msssim-compatible).

    Returns the scalar mean SSIM over batch/space/channels.
    """
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu1 = _gaussian_blur(img1, win_size, sigma)
    mu2 = _gaussian_blur(img2, win_size, sigma)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _gaussian_blur(img1 * img1, win_size, sigma) - mu1_sq
    sigma2_sq = _gaussian_blur(img2 * img2, win_size, sigma) - mu2_sq
    sigma12 = _gaussian_blur(img1 * img2, win_size, sigma) - mu12

    cs = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu12 + c1) / (mu1_sq + mu2_sq + c1)) * cs
    return jnp.mean(ssim_map)


def _per_sample_ssim(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """Per-sample SSIM ``[B]`` (mean over space/channels per image)."""
    c1, c2 = 0.01**2, 0.03**2
    mu1 = _gaussian_blur(img1, 11, 1.5)
    mu2 = _gaussian_blur(img2, 11, 1.5)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _gaussian_blur(img1 * img1, 11, 1.5) - mu1_sq
    s2 = _gaussian_blur(img2 * img2, 11, 1.5) - mu2_sq
    s12 = _gaussian_blur(img1 * img2, 11, 1.5) - mu12
    cs = (2 * s12 + c2) / (s1 + s2 + c2)
    ssim_map = ((2 * mu12 + c1) / (mu1_sq + mu2_sq + c1)) * cs
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def many_to_one_loss(
    final_rec: jax.Array,
    gt: jax.Array,
    lpips_fn=None,
    sample_weights: jax.Array | None = None,
) -> jax.Array:
    """Reference training loss ``LPIPS + L1 + (1 - SSIM)``
    (``train_e2v.py:117-120``). ``lpips_fn(pred, target) -> scalar`` is
    optional (omitted when LPIPS weights are unavailable).

    ``sample_weights [B]`` (optional): weighted per-sample mean instead of
    the batch mean — with 1.0 for real samples and 0.0 for padding it makes
    a padded tail batch produce EXACTLY the loss/gradient of the unpadded
    batch (same compiled shape, no data dropped; the all-ones case equals
    the plain mean)."""
    if sample_weights is None:
        loss = l1_loss(final_rec, gt) + (1.0 - ssim(final_rec, gt))
        if lpips_fn is not None:
            loss = loss + lpips_fn(final_rec, gt)
        return loss
    w = sample_weights.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    per_l1 = jnp.mean(jnp.abs(final_rec - gt), axis=(1, 2, 3))
    per = per_l1 + (1.0 - _per_sample_ssim(final_rec, gt))
    if lpips_fn is not None:
        per = per + jax.vmap(lambda p, t: lpips_fn(p[None], t[None]))(
            final_rec, gt
        )
    return jnp.sum(w * per) / denom
