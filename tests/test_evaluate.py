"""Evaluation metrics: MSE/PSNR known values, SSIM properties + gaussian
variant parity with pytorch-msssim-style expectations."""

import numpy as np
import pytest

from v2e2v_tpu.utils.evaluate import mse, psnr, ssim, ssim_single


def test_mse_psnr_known_values():
    a = np.zeros((8, 8))
    b = np.full((8, 8), 0.5)
    assert mse(a, b) == pytest.approx(0.25)
    assert psnr(a, b) == pytest.approx(20 * np.log10(1 / 0.5))
    assert psnr(a, a) == 100.0  # floor guard


def test_ssim_identity_and_range():
    rng = np.random.default_rng(0)
    img = rng.random((32, 32))
    assert ssim_single(img, img) == pytest.approx(1.0, abs=1e-7)
    noisy = np.clip(img + 0.3 * rng.standard_normal(img.shape), 0, 1)
    s = ssim_single(img, noisy)
    assert -1.0 <= s < 0.95


def test_ssim_monotone_in_noise():
    rng = np.random.default_rng(1)
    img = rng.random((48, 48))
    s_small = ssim_single(img, np.clip(img + 0.05 * rng.standard_normal(img.shape), 0, 1))
    s_large = ssim_single(img, np.clip(img + 0.5 * rng.standard_normal(img.shape), 0, 1))
    assert s_small > s_large


def test_ssim_batch_mean():
    rng = np.random.default_rng(2)
    a = rng.random((3, 16, 16))
    b = rng.random((3, 16, 16))
    per = [ssim_single(x, y) for x, y in zip(a, b)]
    assert ssim(a, b) == pytest.approx(np.mean(per))


def test_training_ssim_gaussian_identity():
    import jax.numpy as jnp

    from v2e2v_tpu.training.losses import ssim as ssim_train

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((2, 32, 32, 1)).astype(np.float32))
    assert float(ssim_train(img, img)) == pytest.approx(1.0, abs=1e-5)
    shifted = jnp.clip(img + 0.2, 0, 1)
    assert float(ssim_train(img, shifted)) < 0.99


def test_normalize_image_minmax_u8():
    from v2e2v_tpu.ops.image import normalize_image_minmax_u8

    x = np.array([[0.25, 0.5], [0.75, 1.0]])
    out = normalize_image_minmax_u8(x)
    assert out.dtype == np.uint8
    assert out.min() == 0 and out.max() == 255
    # constant image -> zeros (cv2 semantics: zero scale)
    assert (normalize_image_minmax_u8(np.full((4, 4), 3.0)) == 0).all()


def test_normalize_image_percentile_clamps():
    from v2e2v_tpu.ops.image import normalize_image_percentile

    rng = np.random.default_rng(4)
    img = rng.normal(100, 30, (64, 64))
    out = normalize_image_percentile(img)
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert 0.4 < np.median(out) < 0.6


def test_training_ssim_bounded_on_near_constant_images():
    """Regression: SSIM must stay in [-1, 1] even when one image is nearly
    constant (variance ~ conv rounding error). On TPU this requires
    precision=HIGHEST inside the gaussian blur — with default conv precision
    the variance cancellation produced |SSIM| >> 1 and noise gradients."""
    import jax.numpy as jnp

    from v2e2v_tpu.training.losses import ssim as ssim_train

    rng = np.random.default_rng(5)
    for _ in range(5):
        rec = jnp.asarray(
            (0.5 + 0.002 * rng.standard_normal((1, 64, 80, 1))).astype(np.float32)
        )
        gt = jnp.asarray(rng.uniform(0, 1, (1, 64, 80, 1)).astype(np.float32))
        v = float(ssim_train(rec, gt))
        assert -1.0 <= v <= 1.0 + 1e-5
