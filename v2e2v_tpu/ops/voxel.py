"""Events -> voxel-grid binning, TPU-first.

Behavioral spec from the reference ``utils/event_process.py`` (lsying009/V2E2V):
``events_to_voxel_grid`` (:15-63, numpy) / ``events_to_voxel_grid_pytorch``
(:66-129) normalize window timestamps to ``[0, num_bins-1]``, map polarity
0 -> -1, split each event bilinearly between its two neighboring temporal bins
and scatter-accumulate into a ``(num_bins, H, W)`` grid;
``event_preprocess`` (:132-177) optionally kills hot pixels then normalizes the
nonzero values to zero mean / unit std.

TPU design: the reference's hot spot is a CPU/GPU ``index_add_`` scatter. Here
the device path uses a **static event capacity** (pad + mask — no dynamic
shapes under jit) and offers two scatter-free-friendly strategies:

- ``method="sort"``: sort events by flat grid index, prefix-sum the values,
  then recover each grid cell with a vectorized ``searchsorted`` + gather
  (``grid = csum[bound[g+1]] - csum[bound[g]]``). No scatter at all — sorts
  and gathers are fast, well-tiled XLA ops on TPU.
- ``method="scatter"``: a single fused ``.at[].add`` scatter, kept as a
  baseline and for tiny event counts.

A numpy oracle (``events_to_voxel_grid_np``) preserves the reference host
semantics exactly for the CPU data-loading path and for golden tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial


def events_to_voxel_grid_np(
    events: np.ndarray, num_bins: int, width: int, height: int
) -> np.ndarray:
    """Host (numpy) voxelization — oracle for the device kernels.

    ``events`` is an ``[N, 4]`` float array of rows ``[t, x, y, p]`` sorted by
    ``t``. Matches ``utils/event_process.py:15-63`` including the
    ``deltaT == 0 -> 1`` guard and polarity ``0 -> -1`` remap. Unlike the
    reference it does not mutate its input.
    """
    voxel_grid = np.zeros((num_bins, height, width), np.float32).ravel()
    if len(events) == 0:
        return voxel_grid.reshape(num_bins, height, width)

    events = np.asarray(events, dtype=np.float64)
    last_stamp = events[-1, 0]
    first_stamp = events[0, 0]
    delta_t = last_stamp - first_stamp
    if delta_t == 0:
        delta_t = 1.0

    ts = (num_bins - 1) * (events[:, 0] - first_stamp) / delta_t
    xs = events[:, 1].astype(np.int64)
    ys = events[:, 2].astype(np.int64)
    pols = events[:, 3].copy()
    pols[pols == 0] = -1  # polarity should be +1 / -1

    tis = np.floor(ts).astype(np.int64)
    dts = ts - tis
    vals_left = pols * (1.0 - dts)
    vals_right = pols * dts

    valid = tis < num_bins
    np.add.at(
        voxel_grid,
        xs[valid] + ys[valid] * width + tis[valid] * width * height,
        vals_left[valid],
    )
    valid = (tis + 1) < num_bins
    np.add.at(
        voxel_grid,
        xs[valid] + ys[valid] * width + (tis[valid] + 1) * width * height,
        vals_right[valid],
    )
    return voxel_grid.reshape(num_bins, height, width).astype(np.float32)


@partial(
    jax.jit, static_argnames=("num_bins", "width", "height", "method", "layout")
)
def events_to_voxel_grid(
    t: jax.Array,
    x: jax.Array,
    y: jax.Array,
    p: jax.Array,
    n_valid: jax.Array,
    *,
    num_bins: int,
    width: int,
    height: int,
    method: str = "sort",
    layout: str = "ref",
) -> jax.Array:
    """Device voxelization with a static event capacity.

    Args:
      t, x, y, p: ``[N]`` arrays (``N`` = static capacity; events sorted by
        ``t``; entries at index >= ``n_valid`` are padding and ignored).
      n_valid: scalar int — number of real events.
      method: "sort" (sort + prefix-sum + searchsorted; scatter-free) or
        "scatter" (one fused scatter-add).
      layout: "ref" — the reference ``(num_bins, H, W)`` grid; "parity" —
        the ``(H/2, W/2, 4*num_bins)`` space-to-depth layout consumed by
        ``cista_sequence(..., input_packed=True)`` (channel order
        ``(y%2, x%2, bin)`` matching ``ops/fused.py space_to_depth``).
        Same values, different flat index arithmetic — zero extra cost at
        the producer, and the reconstruction never pays an in-jit relayout.

    Returns: ``(num_bins, height, width)`` (or parity-packed) float32 voxel
    grid matching ``events_to_voxel_grid_np``.
    """
    capacity = t.shape[0]
    grid_size = num_bins * height * width

    t = t.astype(jnp.float32)
    idx = jnp.arange(capacity, dtype=jnp.int32)
    is_valid = idx < n_valid

    first_stamp = t[0]
    last_stamp = t[jnp.maximum(n_valid - 1, 0)]
    delta_t = last_stamp - first_stamp
    delta_t = jnp.where(delta_t == 0, 1.0, delta_t)

    ts = (num_bins - 1) * (t - first_stamp) / delta_t
    pols = p.astype(jnp.float32)
    pols = jnp.where(pols == 0, -1.0, pols)

    tis = jnp.floor(ts)
    dts = ts - tis
    tis = tis.astype(jnp.int32)
    xs = x.astype(jnp.int32)
    ys = y.astype(jnp.int32)

    left_ok = is_valid & (tis < num_bins) & (tis >= 0)
    right_ok = is_valid & ((tis + 1) < num_bins) & (tis >= 0)

    if layout == "ref":
        base = xs + ys * width
        bin_stride = width * height
    elif layout == "parity":
        if height % 2 or width % 2:
            raise ValueError("layout='parity' requires even height/width")
        # flat index into [H/2, W/2, 4*nb], channel order (y%2, x%2, bin)
        base = (
            ((ys // 2) * (width // 2) + xs // 2) * (4 * num_bins)
            + ((ys % 2) * 2 + xs % 2) * num_bins
        )
        bin_stride = 1
    else:
        raise ValueError(f"unknown layout: {layout!r}")

    left_idx = jnp.where(left_ok, base + tis * bin_stride, grid_size)
    right_idx = jnp.where(right_ok, base + (tis + 1) * bin_stride, grid_size)
    left_val = jnp.where(left_ok, pols * (1.0 - dts), 0.0)
    right_val = jnp.where(right_ok, pols * dts, 0.0)

    all_idx = jnp.concatenate([left_idx, right_idx])
    all_val = jnp.concatenate([left_val, right_val])

    if method == "scatter":
        grid = jnp.zeros((grid_size,), jnp.float32)
        grid = grid.at[all_idx].add(all_val, mode="drop")
    elif method == "sort":
        order = jnp.argsort(all_idx)
        sorted_idx = all_idx[order]
        sorted_val = all_val[order]
        csum = jnp.concatenate(
            [jnp.zeros((1,), jnp.float32), jnp.cumsum(sorted_val)]
        )
        # bound[g] = first position with sorted_idx >= g; cell g sums
        # csum[bound[g+1]] - csum[bound[g]]. Pure gathers — no scatter.
        bounds = jnp.searchsorted(
            sorted_idx, jnp.arange(grid_size + 1, dtype=jnp.int32), side="left"
        )
        grid = csum[bounds[1:]] - csum[bounds[:-1]]
    else:
        raise ValueError(f"unknown method: {method!r}")

    if layout == "parity":
        return grid.reshape(height // 2, width // 2, 4 * num_bins)
    return grid.reshape(num_bins, height, width)


def event_preprocess_np(
    voxel: np.ndarray,
    mode: str = "std",
    filter_hot_pixel: bool = False,
    hot_pixel_threshold: float | None = None,
) -> np.ndarray:
    """Host voxel normalization (reference ``event_preprocess``, :132-154).

    The host path's hot-pixel threshold default is ``25 / num_bins``
    (the device/torch path used ``20 / num_bins`` — pass explicitly to match).
    """
    voxel = np.array(voxel, dtype=np.float32)
    num_bins = voxel.shape[0]
    if filter_hot_pixel:
        thr = 25.0 / num_bins if hot_pixel_threshold is None else hot_pixel_threshold
        voxel[np.abs(voxel) > thr] = 0
    if mode == "maxmin":
        voxel = (voxel - voxel.min()) / (voxel.max() - voxel.min() + 1e-8)
    elif mode == "std":
        nonzero = voxel != 0
        num_nonzeros = nonzero.sum()
        if num_nonzeros > 0:
            mean = voxel.sum() / num_nonzeros
            stddev = np.sqrt((voxel**2).sum() / num_nonzeros - mean**2)
            voxel = nonzero.astype(np.float32) * (voxel - mean) / (stddev + 1e-8)
    return voxel


@partial(jax.jit, static_argnames=("mode", "filter_hot_pixel"))
def event_preprocess(
    voxel: jax.Array,
    mode: str = "std",
    filter_hot_pixel: bool = False,
    hot_pixel_threshold: float | None = None,
) -> jax.Array:
    """Device voxel normalization (reference ``event_preprocess_pytorch``,
    :157-177). Leading dims are batch; bins axis is ``-3``.

    Statistics are PER SAMPLE (reduced over the trailing ``[bins, H, W]``
    axes, leading batch dims preserved): the reference normalizes each voxel
    grid independently — its effective batch is 1 (``v2e_model.py:524-526``
    under the batch_size-1 recipe) — so batched TPU training must not let
    one sample's event statistics rescale another's grid (it also keeps
    results batch-size-invariant). For unbatched ``[bins, H, W]`` input this
    reduces over everything, exactly the reference computation.

    Device-path hot-pixel threshold default is ``20 / num_bins``.
    """
    num_bins = voxel.shape[-3]
    red = (-3, -2, -1)
    if filter_hot_pixel:
        thr = 20.0 / num_bins if hot_pixel_threshold is None else hot_pixel_threshold
        voxel = jnp.where(jnp.abs(voxel) > thr, 0.0, voxel)
    if mode == "maxmin":
        vmin = jnp.min(voxel, axis=red, keepdims=True)
        vmax = jnp.max(voxel, axis=red, keepdims=True)
        voxel = (voxel - vmin) / (vmax - vmin + 1e-8)
    elif mode == "std":
        nonzero = voxel != 0
        num_nonzeros = jnp.sum(nonzero, axis=red, keepdims=True)
        denom = jnp.maximum(num_nonzeros, 1).astype(jnp.float32)
        mean = jnp.sum(voxel, axis=red, keepdims=True) / denom
        stddev = jnp.sqrt(
            jnp.maximum(jnp.sum(voxel**2, axis=red, keepdims=True) / denom - mean**2, 0.0)
        )
        normalized = nonzero.astype(jnp.float32) * (voxel - mean) / (stddev + 1e-8)
        voxel = jnp.where(num_nonzeros > 0, normalized, voxel)
    return voxel


def add_noise_to_voxel(
    key: jax.Array,
    voxel: jax.Array,
    noise_std: float = 1.0,
    noise_fraction: float = 0.1,
) -> jax.Array:
    """Training augmentation (reference ``event_process.py:8-13``)."""
    k_noise, k_mask = jax.random.split(key)
    noise = noise_std * jax.random.normal(k_noise, voxel.shape, dtype=voxel.dtype)
    if noise_fraction < 1.0:
        keep = jax.random.uniform(k_mask, voxel.shape) < noise_fraction
        noise = jnp.where(keep, noise, 0.0)
    return voxel + noise


def voxelize_and_preprocess_np(
    events: np.ndarray,
    num_bins: int,
    width: int,
    height: int,
    filter_hot_pixel: bool = False,
) -> np.ndarray:
    """Host data-path voxelization + std normalization.

    Prefers the native C++ runtime (~20x the numpy scatter; exact reference
    semantics), falling back to the numpy oracle.
    """
    try:
        from .. import runtime

        if runtime.available():
            thr = 25.0 / num_bins if filter_hot_pixel else 0.0
            return runtime.voxelize_events(
                np.ascontiguousarray(events, np.float64),
                num_bins, width, height,
                preprocess=True, hot_pixel_threshold=thr,
            )
    except Exception:
        pass
    grid = events_to_voxel_grid_np(events, num_bins, width, height)
    return event_preprocess_np(grid, mode="std", filter_hot_pixel=filter_hot_pixel)
