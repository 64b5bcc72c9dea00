"""Super-SloMo: backwarp vs torch grid_sample, UNet vs torch oracle,
adaptive upsampler flow."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from v2e2v_tpu.models.superslomo import (
    Upsampler,
    backwarp,
    init_unet,
    unet_apply,
)


def test_backwarp_zero_flow_near_identity_topleft():
    """Reference grid normalizes by W (not W-1): zero flow is exactly
    identity only at the top-left pixel, drifting up to ~1px at the far
    edge — reproduce that quirk (see backwarp docstring)."""
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, 8, 10, 3)).astype(np.float32))
    out = np.asarray(backwarp(img, jnp.zeros((1, 8, 10, 2))))
    np.testing.assert_allclose(out[:, 0, 0], np.asarray(img)[:, 0, 0], atol=1e-5)


def test_backwarp_matches_torch_grid_sample():
    rng = np.random.default_rng(1)
    n, h, w = 2, 12, 16
    img = rng.normal(size=(n, h, w, 3)).astype(np.float32)
    flow = (3 * rng.normal(size=(n, h, w, 2))).astype(np.float32)

    got = np.asarray(backwarp(jnp.asarray(img), jnp.asarray(flow)))

    img_t = torch.from_numpy(np.transpose(img, (0, 3, 1, 2)))
    u = torch.from_numpy(flow[..., 0])
    v = torch.from_numpy(flow[..., 1])
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    x = torch.from_numpy(gx[None].astype(np.float32)) + u
    y = torch.from_numpy(gy[None].astype(np.float32)) + v
    x = 2 * (x / w - 0.5)
    y = 2 * (y / h - 0.5)
    grid = torch.stack((x, y), dim=3)
    want = F.grid_sample(img_t, grid, align_corners=True)
    want = np.transpose(want.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, atol=2e-4)


def _torch_unet_from_params(params, in_ch, out_ch):
    """Build the reference UNet in torch from our params (oracle)."""

    def conv(p):
        w = torch.from_numpy(np.transpose(np.asarray(p["weight"]), (3, 2, 0, 1)))
        b = torch.from_numpy(np.asarray(p["bias"]))
        return w, b

    def apply_conv(x, p, pad):
        w, b = conv(p)
        return F.conv2d(x, w, b, padding=pad)

    def forward(x):
        lr = lambda t: F.leaky_relu(t, 0.1)
        x = lr(apply_conv(x, params["conv1"], 3))
        s1 = lr(apply_conv(x, params["conv2"], 3))
        skips = [s1]
        x = s1
        for name, pad in (("down1", 2), ("down2", 1), ("down3", 1), ("down4", 1), ("down5", 1)):
            x = F.avg_pool2d(x, 2)
            x = lr(apply_conv(x, params[name]["conv1"], pad))
            x = lr(apply_conv(x, params[name]["conv2"], pad))
            skips.append(x)
        for i, name in enumerate(("up1", "up2", "up3", "up4", "up5")):
            skip = skips[-(i + 2)]
            x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
            x = lr(apply_conv(x, params[name]["conv1"], 1))
            x = lr(apply_conv(torch.cat((x, skip), 1), params[name]["conv2"], 1))
        return lr(apply_conv(x, params["conv3"], 1))

    return forward


def test_unet_matches_torch_oracle():
    in_ch, out_ch, h, w = 6, 4, 64, 64
    params = init_unet(jax.random.PRNGKey(0), in_ch, out_ch)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, h, w, in_ch)).astype(np.float32)

    got = np.asarray(unet_apply(params, jnp.asarray(x)))
    oracle = _torch_unet_from_params(params, in_ch, out_ch)
    want = oracle(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    want = np.transpose(want.detach().numpy(), (0, 2, 3, 1))

    assert got.shape == (1, h, w, out_ch)
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_upsampler_adaptive_flow(tmp_path):
    """Random-weight upsampler still executes the full adaptive pipeline."""
    rng = np.random.default_rng(3)
    h, w = 32, 40
    frames = [
        (rng.uniform(0, 255, (h, w))).astype(np.uint8) for _ in range(3)
    ]
    ts = [0.0, 0.1, 0.2]
    up = Upsampler([h, w], ckpt_path=str(tmp_path / "missing.ckpt"))
    assert not up.pretrained

    out_frames, out_ts = up.upsampling(frames, ts)
    assert out_frames.dtype == np.uint8
    assert out_frames.shape[1:] == (h, w)
    assert len(out_frames) == len(out_ts) >= 3
    assert np.all(np.diff(out_ts) > 0)
    assert out_ts[0] == 0.0 and out_ts[-1] == 0.2
    # endpoints survive the normalize/denormalize round trip (+-1 quantization)
    np.testing.assert_allclose(
        out_frames[0].astype(int), frames[0].astype(int), atol=2
    )
