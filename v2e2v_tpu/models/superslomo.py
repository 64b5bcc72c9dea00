"""Super-SloMo frame interpolation (adaptive upsampling), TPU-first.

Behavioral spec from reference ``upsampling/utils/model.py`` +
``upsamp_sequence.py`` (lsying009/V2E2V, via avinashpaliwal/Super-SloMo and
uzh-rpg/rpg_vid2e):

- ``UNet(in, out)``: 7x7/7x7 stem, five ``down`` blocks (avg-pool + 2 convs),
  five ``up`` blocks (bilinear 2x align_corners=True + conv + skip-concat +
  conv), leaky-ReLU 0.1 everywhere including the output conv.
- Two instances: ``flowComp`` UNet(6,4) and ``ArbTimeFlowIntrp`` UNet(20,5).
- ``backWarp``: flow-based bilinear ``grid_sample`` warp (align_corners=True,
  zero padding).
- ``Upsampler.upsampling``: per adjacent frame pair, bidirectional flow ->
  adaptive interpolation count = ceil(max flow magnitude) -> per
  intermediate time, warp + refinement UNet + visibility-weighted blend.

TPU design: all compute is jitted; the two data-dependent quantities (the
interpolation count per pair and the image size) are host-level values —
the per-``t`` interpolation kernel compiles once per image size and is
reused for every pair and every t (t is a traced scalar).
"""

from __future__ import annotations

import os
import warnings
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import bilinear_resize, conv_init
from ..ops.image import CropParameters

MEAN = np.array([0.429, 0.431, 0.397], np.float32)  # reference const.py

_ENV_VAR = "V2E2V_SUPERSLOMO_CKPT"
_DEFAULT_CKPT = os.path.join("upsampling", "checkpoint", "SuperSloMo.ckpt")


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------

_CH = {"down1": 64, "down2": 128, "down3": 256, "down4": 512, "down5": 512,
       "up1": 512, "up2": 256, "up3": 128, "up4": 64, "up5": 32}


def init_unet(key: jax.Array, in_ch: int, out_ch: int) -> dict:
    params: dict = {}
    keys = iter(jax.random.split(key, 32))
    params["conv1"] = conv_init(next(keys), in_ch, 32, 7)
    params["conv2"] = conv_init(next(keys), 32, 32, 7)
    prev = 32
    for name in ("down1", "down2", "down3", "down4", "down5"):
        c = _CH[name]
        params[name] = {
            "conv1": conv_init(next(keys), prev, c, 5 if name == "down1" else 3),
            "conv2": conv_init(next(keys), c, c, 5 if name == "down1" else 3),
        }
        prev = c
    for name in ("up1", "up2", "up3", "up4", "up5"):
        c = _CH[name]
        params[name] = {
            "conv1": conv_init(next(keys), prev, c, 3),
            "conv2": conv_init(next(keys), 2 * c, c, 3),
        }
        prev = c
    params["conv3"] = conv_init(next(keys), 32, out_ch, 3)
    return params


def _conv(x, p, k):
    pad = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), (1, 1),
        ((pad, pad), (pad, pad)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y + p["bias"].astype(x.dtype)


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.1)


def _avg_pool(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def unet_apply(params: dict, x: jax.Array) -> jax.Array:
    x = _lrelu(_conv(x, params["conv1"], 7))
    s1 = _lrelu(_conv(x, params["conv2"], 7))
    skips = [s1]
    x = s1
    for name, k in (("down1", 5), ("down2", 3), ("down3", 3), ("down4", 3), ("down5", 3)):
        x = _avg_pool(x)
        x = _lrelu(_conv(x, params[name]["conv1"], k))
        x = _lrelu(_conv(x, params[name]["conv2"], k))
        skips.append(x)
    # up blocks consume skips s5..s1
    for i, name in enumerate(("up1", "up2", "up3", "up4", "up5")):
        skip = skips[-(i + 2)]
        x = bilinear_resize(x, x.shape[1] * 2, x.shape[2] * 2, align_corners=True)
        x = _lrelu(_conv(x, params[name]["conv1"], 3))
        x = _lrelu(_conv(jnp.concatenate([x, skip], -1), params[name]["conv2"], 3))
    return _lrelu(_conv(x, params["conv3"], 3))


def backwarp(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Bilinear warp of NHWC ``img`` by NHWC 2-channel ``flow`` (u, v) —
    torch ``grid_sample(align_corners=True, padding_mode='zeros')`` fed the
    reference's grid ``2*((x+u)/W - 0.5)`` (``model.py:276-284``). Note the
    reference normalizes by W (not W-1), so the effective sample point is
    ``(x+u) * (W-1)/W`` — that scale quirk is reproduced for weight parity."""
    n, h, w, _ = img.shape
    u = flow[..., 0]
    v = flow[..., 1]
    gx = (jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 2) + u) * ((w - 1) / w)
    gy = (jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 1) + v) * ((h - 1) / h)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = jnp.take_along_axis(
            img.reshape(n, h * w, -1),
            (yc * w + xc).reshape(n, h * w, 1),
            axis=1,
        ).reshape(n, h, w, -1)
        return vals * inb[..., None]

    out = (
        gather(y0, x0) * ((1 - wx) * (1 - wy))[..., None]
        + gather(y0, x0 + 1) * (wx * (1 - wy))[..., None]
        + gather(y0 + 1, x0) * ((1 - wx) * wy)[..., None]
        + gather(y0 + 1, x0 + 1) * (wx * wy)[..., None]
    )
    return out


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

def _convert_unet_sd(sd: dict) -> dict:
    def conv(prefix):
        w = np.asarray(sd[prefix + ".weight"], np.float32)
        return {
            "weight": np.transpose(w, (2, 3, 1, 0)),
            "bias": np.asarray(sd[prefix + ".bias"], np.float32),
        }

    params = {"conv1": conv("conv1"), "conv2": conv("conv2"), "conv3": conv("conv3")}
    for name in ("down1", "down2", "down3", "down4", "down5", "up1", "up2", "up3", "up4", "up5"):
        params[name] = {"conv1": conv(name + ".conv1"), "conv2": conv(name + ".conv2")}
    return params


def load_superslomo_checkpoint(path: str):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    to_np = lambda sd: {k: v.numpy() for k, v in sd.items()}
    return (
        _convert_unet_sd(to_np(ckpt["state_dictFC"])),
        _convert_unet_sd(to_np(ckpt["state_dictAT"])),
    )


# ---------------------------------------------------------------------------
# Upsampler
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=())
def _flow_pair(flow_params, i0, i1):
    flow_out = unet_apply(flow_params, jnp.concatenate([i0, i1], -1))
    return flow_out[..., :2], flow_out[..., 2:]


@jax.jit
def _interp_at_t(intrp_params, i0, i1, f01, f10, t):
    temp = -t * (1 - t)
    f_t0 = temp * f01 + (t * t) * f10
    f_t1 = ((1 - t) * (1 - t)) * f01 + temp * f10

    g0 = backwarp(i0, f_t0)
    g1 = backwarp(i1, f_t1)
    intrp = unet_apply(
        intrp_params,
        jnp.concatenate([i0, i1, f01, f10, f_t1, f_t0, g1, g0], -1),
    )
    f_t0_f = intrp[..., 0:2] + f_t0
    f_t1_f = intrp[..., 2:4] + f_t1
    v_t0 = jax.nn.sigmoid(intrp[..., 4:5])
    v_t1 = 1 - v_t0

    g0f = backwarp(i0, f_t0_f)
    g1f = backwarp(i1, f_t1_f)
    w0, w1 = 1 - t, t
    return (w0 * v_t0 * g0f + w1 * v_t1 * g1f) / (w0 * v_t0 + w1 * v_t1 + 1e-12)


class Upsampler:
    """Adaptive Super-SloMo upsampler (reference ``upsamp_sequence.py:24``).

    Loads the public SuperSloMo.ckpt (path argument, ``$V2E2V_SUPERSLOMO_CKPT``
    or ``upsampling/checkpoint/SuperSloMo.ckpt``); without a checkpoint it
    falls back to random weights with a loud warning (shapes/flow still
    exercise the full pipeline — useful for tests, useless for quality).
    """

    def __init__(self, image_dim, is_train: bool = False, ckpt_path: str | None = None):
        self.crop = CropParameters(image_dim[1], image_dim[0], 5)
        path = ckpt_path or os.environ.get(_ENV_VAR) or _DEFAULT_CKPT
        if os.path.isfile(path):
            self.flow_params, self.intrp_params = load_superslomo_checkpoint(path)
            self.pretrained = True
        else:
            warnings.warn(
                f"SuperSloMo checkpoint not found at {path!r}; using RANDOM "
                "weights — interpolation quality will be meaningless."
            )
            k1, k2 = jax.random.split(jax.random.PRNGKey(0))
            self.flow_params = init_unet(k1, 6, 4)
            self.intrp_params = init_unet(k2, 20, 5)
            self.pretrained = False

    def _to_net(self, img_u8: np.ndarray) -> np.ndarray:
        """uint8 gray [H,W] -> normalized RGB NHWC in the net's crop size."""
        rgb = np.repeat(img_u8[..., None].astype(np.float32) / 255.0, 3, axis=-1)
        rgb -= MEAN
        return rgb

    def upsampling(self, img_sequence, time_sequence):
        """Adaptively interpolate a list of gray uint8 frames.

        Returns ``(np.ndarray [M,H,W] uint8, np.ndarray [M] float64)`` like
        the reference (:87-133).
        """
        frames_net = [
            np.asarray(self.crop.pad(jnp.asarray(self._to_net(f))[None]))
            for f in img_sequence
        ]
        out_frames: list[np.ndarray] = []
        out_ts: list[float] = []

        def denorm_to_gray(x):
            rgb = np.clip(np.asarray(x)[0] + MEAN, 0.0, 1.0)
            rgb = rgb[self.crop.iy0 : self.crop.iy1, self.crop.ix0 : self.crop.ix1]
            # reference converts via cv2 BGR2GRAY on a 0-1 float image
            gray = 0.114 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.299 * rgb[..., 2]
            # BGR order in reference: channels are replicated gray, so any
            # weighting is equivalent; keep standard luma.
            return np.uint8(255.0 * gray)

        n = len(img_sequence)
        for i in range(n - 1):
            i0 = jnp.asarray(frames_net[i])
            i1 = jnp.asarray(frames_net[i + 1])
            t0, t1 = float(time_sequence[i]), float(time_sequence[i + 1])

            f01, f10 = _flow_pair(self.flow_params, i0, i1)
            mag = np.maximum(
                np.asarray(jnp.sqrt((f01**2).sum(-1)).max()),
                np.asarray(jnp.sqrt((f10**2).sum(-1)).max()),
            )
            count = int(np.ceil(mag))

            pair_frames = [(t0, denorm_to_gray(i0))]
            for k in range(1, count):
                t = k / count
                ft = _interp_at_t(self.intrp_params, i0, i1, f01, f10, t)
                pair_frames.append((t0 + t * (t1 - t0), denorm_to_gray(ft)))
            pair_frames.append((t1, denorm_to_gray(i1)))
            pair_frames.sort(key=lambda p: p[0])

            if i != n - 2:  # last frame of the pair is the next pair's first
                pair_frames = pair_frames[:-1]
            for t, fr in pair_frames:
                out_ts.append(t)
                out_frames.append(fr)

        return np.stack(out_frames, 0), np.asarray(out_ts)
