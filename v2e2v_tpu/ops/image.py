"""Image utilities: normalization and crop/pad bookkeeping.

Spec from reference ``utils/image_process.py`` (percentile normalize :10-17,
``CropParameters``/``optimal_crop_size`` :19-56) and the ``cv2.NORM_MINMAX``
eval normalization used at ``test_e2v.py:122``.
"""

from __future__ import annotations

from math import ceil, floor

import jax
import jax.numpy as jnp
import numpy as np


def normalize_image_percentile(image, low: float = 1.0, high: float = 99.0):
    """Robust 1st/99th-percentile normalization, clamped to [0, 1].

    Matches ``utils/image_process.py:10-17``. Works on numpy or jax arrays.
    """
    if isinstance(image, np.ndarray):
        mini = np.percentile(image.ravel(), low)
        maxi = np.percentile(image.ravel(), high)
        out = (image - mini) / (maxi - mini + 1e-5)
        return np.clip(out, 0.0, 1.0)
    mini = jnp.percentile(image.ravel(), low)
    maxi = jnp.percentile(image.ravel(), high)
    out = (image - mini) / (maxi - mini + 1e-5)
    return jnp.clip(out, 0.0, 1.0)


def normalize_image_minmax_u8(image: np.ndarray) -> np.ndarray:
    """``np.uint8(cv2.normalize(..., 0, 255, cv2.NORM_MINMAX))`` — the exact
    prediction normalization of reference ``test_e2v.py:122`` / ``test.py:122``.

    The reference's uint8 conversion is a numpy CAST of the cv2-normalized
    float image, i.e. it TRUNCATES — an earlier rounding version here biased
    eval MSE ~1.3% high vs the reference loop on identical predictions
    (~13%% of pixels land one level apart). cv2 is used directly (it is a
    hard dependency of every surrounding data/eval path already); a
    hand-rolled fallback could silently drift from cv2's convertTo
    arithmetic, which is exactly this bug class.
    """
    import cv2

    image = np.asarray(image)
    return np.uint8(cv2.normalize(image, None, 0, 255, cv2.NORM_MINMAX))


def optimal_crop_size(max_size: int, max_subsample_factor: int) -> int:
    """Smallest integer >= max_size divisible by 2**max_subsample_factor."""
    k = 2**max_subsample_factor
    return int(k * ceil(max_size / k))


class CropParameters:
    """Pad-to-2^k bookkeeping for encoder/decoder nets (Super-SloMo path).

    Matches ``utils/image_process.py:28-56`` / ``upsampling/utils/dataset.py``:
    reflection-pad the input up to the optimal crop size, and expose the
    ``iy0:iy1, ix0:ix1`` window to crop the network output back.
    """

    def __init__(self, width: int, height: int, num_encoders: int):
        self.height = height
        self.width = width
        self.num_encoders = num_encoders
        self.width_crop_size = optimal_crop_size(width, num_encoders)
        self.height_crop_size = optimal_crop_size(height, num_encoders)

        self.padding_top = ceil(0.5 * (self.height_crop_size - height))
        self.padding_bottom = floor(0.5 * (self.height_crop_size - height))
        self.padding_left = ceil(0.5 * (self.width_crop_size - width))
        self.padding_right = floor(0.5 * (self.width_crop_size - width))

        cx = floor(self.width_crop_size / 2)
        cy = floor(self.height_crop_size / 2)
        self.ix0 = cx - floor(width / 2)
        self.ix1 = cx + ceil(width / 2)
        self.iy0 = cy - floor(height / 2)
        self.iy1 = cy + ceil(height / 2)

    def pad(self, x: jax.Array) -> jax.Array:
        """Reflection-pad NHWC (or ...HWC / ...HW) input up to crop size."""
        pads = [(0, 0)] * x.ndim
        # channel-last (..., H, W, C) for ndim >= 3, else (..., H, W)
        h_axis = x.ndim - 3 if x.ndim >= 3 else x.ndim - 2
        w_axis = h_axis + 1
        pads[h_axis] = (self.padding_top, self.padding_bottom)
        pads[w_axis] = (self.padding_left, self.padding_right)
        return jnp.pad(x, pads, mode="reflect")

    def crop(self, x: jax.Array) -> jax.Array:
        """Crop a padded channel-last (or 2D) output back to (height, width)."""
        if x.ndim >= 3:
            return x[..., self.iy0 : self.iy1, self.ix0 : self.ix1, :]
        return x[..., self.iy0 : self.iy1, self.ix0 : self.ix1]
