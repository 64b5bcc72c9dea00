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
    import cv2

    from v2e2v_tpu.ops.image import normalize_image_minmax_u8

    x = np.array([[0.25, 0.5], [0.75, 1.0]])
    out = normalize_image_minmax_u8(x)
    assert out.dtype == np.uint8
    assert out.min() == 0 and out.max() == 255
    # constant image -> zeros (cv2 semantics: zero scale)
    assert (normalize_image_minmax_u8(np.full((4, 4), 3.0)) == 0).all()

    # bit-exact vs the reference's actual pipeline:
    # np.uint8(cv2.normalize(pred, None, 0, 255, NORM_MINMAX)) — note the
    # reference uint8 conversion TRUNCATES (numpy cast, not a round)
    rng = np.random.default_rng(7)
    for shape in ((180, 240), (33, 41)):
        pred = rng.uniform(0.01, 0.9, shape).astype(np.float32)
        ref = np.uint8(cv2.normalize(pred, None, 0, 255, cv2.NORM_MINMAX))
        np.testing.assert_array_equal(normalize_image_minmax_u8(pred), ref)


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


def test_lpips_architecture_vs_torch_transcription():
    """Pin the LPIPS-VGG architecture against an in-test torch transcription
    of richzhang/PerceptualSimilarity's forward (the contract behind the
    reference ``utils/evaluate.py:45-63``): VGG16 features tapped at
    relu{1_2,2_2,3_3,4_3,5_3}, channel-unit-normalize, squared diff, nonneg
    1x1 lin heads, spatial mean, sum over layers — with SHARED random weights
    (the published weight blobs are unobtainable offline; correctness of the
    computation must not depend on them)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from v2e2v_tpu.training import lpips_jax

    blocks = lpips_jax._VGG_BLOCKS
    rng = np.random.default_rng(0)

    convs_np = []
    in_ch = 3
    for out_ch, n_convs in blocks:
        for _ in range(n_convs):
            w = rng.normal(
                0, 1.0 / np.sqrt(9 * in_ch), (out_ch, in_ch, 3, 3)
            ).astype(np.float32)
            b = rng.normal(0, 0.05, (out_ch,)).astype(np.float32)
            convs_np.append((w, b))
            in_ch = out_ch
    lins_np = [
        rng.random(c).astype(np.float32) * 0.1 for c, _ in blocks
    ]

    params = {
        "convs": [
            {"weight": np.transpose(w, (2, 3, 1, 0)), "bias": b}
            for w, b in convs_np
        ],
        "lins": lins_np,
    }

    def torch_lpips(pred_gray, target_gray):
        shift = torch.from_numpy(lpips_jax._SHIFT).view(1, 3, 1, 1)
        scale = torch.from_numpy(lpips_jax._SCALE).view(1, 3, 1, 1)

        def feats(x):
            x = x.repeat(1, 3, 1, 1) * 2 - 1  # gray replicate + [0,1]->[-1,1]
            x = (x - shift) / scale
            out = []
            ci = 0
            for bi, (_, n_convs) in enumerate(blocks):
                for _ in range(n_convs):
                    w, b = convs_np[ci]
                    ci += 1
                    x = F.relu(
                        F.conv2d(x, torch.from_numpy(w), torch.from_numpy(b),
                                 padding=1)
                    )
                out.append(x)
                if bi < len(blocks) - 1:
                    x = F.max_pool2d(x, 2)
            return out

        fa, fb = feats(pred_gray), feats(target_gray)
        total = 0.0
        for a, b, lin in zip(fa, fb, lins_np):
            na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = (na - nb) ** 2
            layer = (d * torch.from_numpy(lin).view(1, -1, 1, 1)).sum(1)
            total = total + layer.mean(dim=(1, 2))
        return float(total.mean())

    pred = rng.random((2, 64, 64, 1)).astype(np.float32)
    target = rng.random((2, 64, 64, 1)).astype(np.float32)

    import jax.numpy as jnp

    ours = float(
        lpips_jax.lpips_distance(
            params, jnp.asarray(pred), jnp.asarray(target), normalize=True
        )
    )
    with torch.no_grad():
        theirs = torch_lpips(
            torch.from_numpy(np.moveaxis(pred, -1, 1).copy()),
            torch.from_numpy(np.moveaxis(target, -1, 1).copy()),
        )
    assert ours == pytest.approx(theirs, abs=2e-5), (ours, theirs)
    # sanity: identical inputs -> 0
    zero = float(
        lpips_jax.lpips_distance(
            params, jnp.asarray(pred), jnp.asarray(pred), normalize=True
        )
    )
    assert zero == pytest.approx(0.0, abs=1e-6)


# --- SSIM pinned against an independent skimage transcription --------------
# skimage itself is not installed here; scipy (its actual filter backend) is.
# This is a line-faithful transcription of skimage.metrics
# .structural_similarity (gaussian_weights=False, use_sample_covariance=True
# — the reference's call, /root/reference/utils/evaluate.py:31-42) built on
# scipy.ndimage.uniform_filter, structurally independent of
# utils/evaluate.py's integral-image formulation. Golden values are pinned
# as constants so both implementations are anchored, not self-referential.

def _skimage_ssim_transcription(im1, im2, win_size=7, data_range=1.0,
                                K1=0.01, K2=0.03):
    from scipy.ndimage import uniform_filter

    im1 = im1.astype(np.float64)
    im2 = im2.astype(np.float64)
    NP = win_size ** im1.ndim
    cov_norm = NP / (NP - 1)

    def f(x):
        return uniform_filter(x, size=win_size)

    ux, uy = f(im1), f(im2)
    uxx, uyy, uxy = f(im1 * im1), f(im2 * im2), f(im1 * im2)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    C1, C2 = (K1 * data_range) ** 2, (K2 * data_range) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
        (ux**2 + uy**2 + C1) * (vx + vy + C2)
    )
    pad = (win_size - 1) // 2
    return S[pad:-pad, pad:-pad].mean(dtype=np.float64)


def _ssim_golden_cases():
    rng = np.random.default_rng(42)
    a = rng.uniform(0, 1, (48, 64))
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1)
    x = np.linspace(0, 1, 64)[None, :] * np.ones((48, 1))
    y = np.roll(x, 3, axis=1)
    c = (rng.uniform(0, 1, (48, 64)) > 0.5).astype(np.float64)
    e = rng.uniform(0.4, 0.6, (48, 64))
    return {
        "noisy": (a, b, 0.9473339155645001),
        "gradient_shift": (x, y, 0.9288251198193362),
        "binary_inverted": (c, 1.0 - c, -0.9541774811597215),
        "low_contrast": (e, e * 0.9 + 0.05, 0.9952004656587551),
    }


def test_ssim_matches_skimage_transcription_and_goldens():
    from v2e2v_tpu.utils.evaluate import ssim_single

    for name, (p, q, golden) in _ssim_golden_cases().items():
        ours = ssim_single(p, q)
        transcribed = _skimage_ssim_transcription(p, q)
        # the two independent formulations agree...
        assert abs(ours - transcribed) < 1e-12, name
        # ...and both match the pinned golden constant
        assert abs(ours - golden) < 1e-10, (name, ours, golden)
        assert abs(transcribed - golden) < 1e-10, (name, transcribed, golden)


def test_ssim_identity_is_one():
    from v2e2v_tpu.utils.evaluate import ssim_single

    rng = np.random.default_rng(7)
    a = rng.uniform(0, 1, (32, 40))
    assert abs(ssim_single(a, a) - 1.0) < 1e-12
