"""LPIPS (Learned Perceptual Image Patch Similarity), VGG16 backbone, in JAX.

The reference uses ``lpips.LPIPS(net='vgg')`` with ``normalize=True``
(``utils/evaluate.py:45-63``) for both the training loss and evaluation.
Architecture (from the LPIPS paper / richzhang/PerceptualSimilarity):

  input in [-1, 1] -> per-channel scaling layer -> VGG16 conv features tapped
  at relu1_2/relu2_2/relu3_3/relu4_3/relu5_3 -> channel-unit-normalize ->
  squared difference -> per-layer nonneg 1x1 linear head -> spatial mean ->
  sum over layers.

Weights are NOT bundled (this environment has no torchvision/lpips and no
egress). Provide them via ``V2E2V_LPIPS_WEIGHTS`` pointing at either

- a torch file containing ``{'vgg': vgg16_features_state_dict,
  'lin': lpips_lin_state_dict}``, or
- a torchvision ``vgg16`` checkpoint (lin heads then default to uniform
  1/C averaging — a close LPIPS surrogate, clearly reported as such).

``available()`` tells callers whether a real LPIPS is loadable; CLIs report
NaN for LPIPS otherwise (metric tables stay format-compatible).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, num_convs) per block; taps after each block
_VGG_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_ENV_VAR = "V2E2V_LPIPS_WEIGHTS"


def available() -> bool:
    path = os.environ.get(_ENV_VAR)
    return bool(path) and os.path.exists(path)


def _torch_to_params(sd: dict) -> dict:
    """torchvision vgg16 ``features`` state_dict -> conv param list."""
    convs = []
    idx = 0
    keys = sorted(
        {int(k.split(".")[0]) for k in sd if k.endswith("weight")}
    )
    for k in keys:
        w = np.asarray(sd[f"{k}.weight"], np.float32)
        b = np.asarray(sd[f"{k}.bias"], np.float32)
        convs.append(
            {"weight": np.transpose(w, (2, 3, 1, 0)), "bias": b}
        )
        idx += 1
    return convs


def load_params(path: str | None = None) -> dict:
    """Load LPIPS params from a torch file (see module docstring)."""
    import torch

    path = path or os.environ.get(_ENV_VAR)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)

    if isinstance(ckpt, dict) and "vgg" in ckpt:
        vgg_sd = ckpt["vgg"]
        lin_sd = ckpt.get("lin")
    else:
        # bare torchvision vgg16 checkpoint
        vgg_sd = {
            k[len("features."):]: v for k, v in ckpt.items() if k.startswith("features.")
        }
        lin_sd = None

    vgg_sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in vgg_sd.items()}
    convs = _torch_to_params(vgg_sd)

    lins = []
    taps = [64, 128, 256, 512, 512]
    if lin_sd is not None:
        lin_sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in lin_sd.items()}
        for i in range(5):
            w = np.asarray(lin_sd[f"lin{i}.model.1.weight"], np.float32)  # [1,C,1,1]
            lins.append(w.reshape(-1))
    else:
        lins = [np.full((c,), 1.0 / c, np.float32) for c in taps]
    return {"convs": convs, "lins": lins}


def _vgg_features(params: dict, x: jax.Array) -> list[jax.Array]:
    """x: NHWC in [-1, 1]. Returns the 5 tapped feature maps."""
    x = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
    feats = []
    ci = 0
    for block, (out_ch, n_convs) in enumerate(_VGG_BLOCKS):
        for _ in range(n_convs):
            p = params["convs"][ci]
            ci += 1
            x = jax.lax.conv_general_dilated(
                x,
                jnp.asarray(p["weight"], x.dtype),
                (1, 1),
                ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype) + jnp.asarray(p["bias"], x.dtype)
            x = jax.nn.relu(x)
        feats.append(x)
        if block < len(_VGG_BLOCKS) - 1:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
    return feats


def _unit_normalize(x: jax.Array) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + 1e-10)


@partial(jax.jit, static_argnames=("normalize",))
def lpips_distance(
    params: dict, pred: jax.Array, target: jax.Array, normalize: bool = True
) -> jax.Array:
    """Mean LPIPS distance. pred/target: ``[B, H, W, 1 or 3]`` (gray images
    are channel-replicated like the reference wrapper)."""
    if pred.shape[-1] == 1:
        pred = jnp.tile(pred, (1, 1, 1, 3))
    if target.shape[-1] == 1:
        target = jnp.tile(target, (1, 1, 1, 3))
    if normalize:  # [0,1] -> [-1,1]
        pred = 2 * pred - 1
        target = 2 * target - 1

    f_pred = _vgg_features(params, pred)
    f_tgt = _vgg_features(params, target)
    total = 0.0
    for fp, ft, lin in zip(f_pred, f_tgt, params["lins"]):
        d = (_unit_normalize(fp) - _unit_normalize(ft)) ** 2
        layer = jnp.sum(d * jnp.asarray(lin, d.dtype), axis=-1)  # 1x1 head
        total = total + jnp.mean(layer, axis=(1, 2))
    return jnp.mean(total)


def make_lpips_fn(path: str | None = None):
    """Returns ``fn(pred, target) -> scalar`` or ``None`` if unavailable."""
    if path is None and not available():
        return None
    params = load_params(path)
    return lambda pred, target: lpips_distance(params, pred, target, normalize=True)
