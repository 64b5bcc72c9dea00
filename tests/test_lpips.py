"""LPIPS path coverage without real VGG weights.

The environment has no torchvision/lpips blobs (VERDICT.md "missing" #1), so
every recorded run used L1+SSIM only and the LPIPS branches of the training
loss and eval were dead code. These tests synthesize a RANDOM VGG16-shaped
torch checkpoint, load it through the real ``V2E2V_LPIPS_WEIGHTS`` machinery
(``training/lpips_jax.py``), and drive (a) the metric itself, (b) a gradient
through the FULL reference training loss ``LPIPS + L1 + (1 - SSIM)``
(reference loss at ``train_e2v.py:117-120``) — so when real weights appear,
only the file changes.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from v2e2v_tpu.training.lpips_jax import (  # noqa: E402
    _VGG_BLOCKS,
    available,
    load_params,
    lpips_distance,
    make_lpips_fn,
)
from v2e2v_tpu.training.losses import many_to_one_loss  # noqa: E402


@pytest.fixture(scope="module")
def vgg_ckpt(tmp_path_factory):
    """Random torchvision-vgg16-layout checkpoint (``features.N.weight``)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    sd = {}
    # torchvision vgg16.features layer indices: conv indices with maxpools
    # interleaved — convs at 0,2, 5,7, 10,12,14, 17,19,21, 24,26,28
    conv_idx = iter([0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28])
    in_ch = 3
    for out_ch, n_convs in _VGG_BLOCKS:
        for _ in range(n_convs):
            i = next(conv_idx)
            sd[f"features.{i}.weight"] = torch.from_numpy(
                (0.1 * rng.standard_normal((out_ch, in_ch, 3, 3))).astype(np.float32)
            )
            sd[f"features.{i}.bias"] = torch.from_numpy(
                np.zeros((out_ch,), np.float32)
            )
            in_ch = out_ch
    path = str(tmp_path_factory.mktemp("lpips") / "vgg16_random.pth")
    torch.save(sd, path)
    return path


def test_env_var_path_and_availability(vgg_ckpt, monkeypatch):
    monkeypatch.delenv("V2E2V_LPIPS_WEIGHTS", raising=False)
    assert not available()
    assert make_lpips_fn() is None
    monkeypatch.setenv("V2E2V_LPIPS_WEIGHTS", vgg_ckpt)
    assert available()
    fn = make_lpips_fn()
    assert fn is not None


def test_lpips_metric_properties(vgg_ckpt):
    params = load_params(vgg_ckpt)
    key = jax.random.PRNGKey(1)
    a = jax.random.uniform(key, (2, 32, 32, 1))
    b = jax.random.uniform(jax.random.fold_in(key, 1), (2, 32, 32, 1))
    d_self = float(lpips_distance(params, a, a))
    d_ab = float(lpips_distance(params, a, b))
    assert d_self == pytest.approx(0.0, abs=1e-6)
    assert d_ab > 0.0
    assert np.isfinite(d_ab)


def test_gradient_through_full_training_loss(vgg_ckpt):
    """The reference loss LPIPS + L1 + (1 - SSIM) must be differentiable
    end-to-end through the VGG tower (both plain and sample-weighted)."""
    fn = make_lpips_fn(vgg_ckpt)
    key = jax.random.PRNGKey(2)
    gt = jax.random.uniform(key, (2, 32, 32, 1))

    def loss_plain(pred):
        return many_to_one_loss(pred, gt, lpips_fn=fn)

    def loss_weighted(pred):
        return many_to_one_loss(
            pred, gt, lpips_fn=fn, sample_weights=jnp.array([1.0, 0.0])
        )

    pred = jax.random.uniform(jax.random.fold_in(key, 1), (2, 32, 32, 1))
    for loss in (loss_plain, loss_weighted):
        val, grad = jax.value_and_grad(loss)(pred)
        assert np.isfinite(float(val))
        g = np.asarray(grad)
        assert np.all(np.isfinite(g))
        assert float(np.abs(g).sum()) > 0.0

    # the padding sample must contribute zero gradient under masking
    _, grad = jax.value_and_grad(loss_weighted)(pred)
    assert float(np.abs(np.asarray(grad)[1]).sum()) == pytest.approx(0.0, abs=1e-12)
