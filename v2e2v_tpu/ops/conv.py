"""Functional conv primitives and recurrent conv cells (NHWC, TPU-first).

Behavioral spec from reference ``e2v/base_layers.py`` (lsying009/V2E2V):
reflect-padded Conv2d (:135-161), ConvLSTM cell (:75-130), ConvLSTC sparse-code
cell (:38-71), bilinear-upsample conv (:166-210). Re-designed as pure
functions over explicit parameter pytrees:

- activations are NHWC (channel-last — the natural TPU layout: the channel
  axis lands on the 128-wide lane dimension),
- weights are HWIO; torch OIHW checkpoints convert via ``transpose(2,3,1,0)``,
- gate convs keep the torch output-channel ordering so converted checkpoints
  are bit-compatible,
- no hidden state: recurrent cells are ``(params, x, state) -> (y, state)``
  steps designed to sit inside ``jax.lax.scan``.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# initializers (match torch Conv2d defaults: kaiming_uniform(a=sqrt(5)) =>
# U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias)
# ---------------------------------------------------------------------------

def conv_init(key: jax.Array, in_ch: int, out_ch: int, k: int, bias: bool = True) -> Params:
    fan_in = in_ch * k * k
    bound = 1.0 / math.sqrt(fan_in)
    k_w, k_b = jax.random.split(key)
    params = {
        "weight": jax.random.uniform(
            k_w, (k, k, in_ch, out_ch), jnp.float32, -bound, bound
        )
    }
    if bias:
        params["bias"] = jax.random.uniform(k_b, (out_ch,), jnp.float32, -bound, bound)
    return params


# ---------------------------------------------------------------------------
# conv application
# ---------------------------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")

# Route 3x3/stride-1/reflect-pad-1 convs through the pad-copy-free fast path
# (exact; see _reflect1_conv3x3). Module-level switch for A/B benchmarking.
REFLECT_FAST_PATH = True


def _reflect1_conv3x3(x: jax.Array, w: jax.Array, preferred=jnp.float32) -> jax.Array:
    """Exact ``conv_valid(reflect_pad1(x), w)`` without the pad copy.

    ``preferred`` is the accumulation dtype (``jnp.int32`` for the int8
    path — the strip algebra is exact in integer arithmetic too, since it
    only relies on conv linearity).

    ``jnp.pad(mode='reflect')`` lowers to concat-of-reversed-slices — a full
    HBM round-trip per conv input (measured ~16% of the CISTA step,
    ``scripts/bench_pad_experiment.py``). Zero padding, by contrast, folds
    into the conv HLO's padding config (no copy). Since conv is linear and
    ``reflect_pad1(x) = zero_pad1(x) + B`` with ``B`` supported on the padded
    ring, the reflect result is the zero-padded conv plus thin strip
    corrections touching only the outermost output ring:

    - ring rows:   ``B[-1, :] = reflectW(x[1, :])``, ``B[h, :] = reflectW(x[h-2, :])``
      -> 1x3 convs with kernel rows ``w[0]`` / ``w[2]`` over single rows;
    - ring cols (interior rows only, corners belong to the rows above):
      ``B[0:h, -1] = x[:, 1]``, ``B[0:h, w] = x[:, w-2]``
      -> zero-padded 3x1 convs with kernel cols ``w[:, 0]`` / ``w[:, 2]``.
    """
    b, h, w_in, c = x.shape
    cout = w.shape[3]
    wk = w.astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, wk, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=_DN, preferred_element_type=preferred,
    )

    # --- all four strip corrections in ONE grouped 1x3 conv ---------------
    # Strips are laid out along a common axis of length L = max(H, W) + 2
    # (rows keep their reflect-extended width; columns transpose H onto that
    # axis with zero ends, since the corners already belong to the rows).
    L = max(h, w_in)

    def to_len(s: jax.Array) -> jax.Array:  # [B,1,l,C] -> [B,1,L+2,C]
        return jnp.pad(s, ((0, 0), (0, 0), (0, L + 2 - s.shape[2]), (0, 0)))

    top_in = jnp.concatenate([x[:, 1:2, 1:2], x[:, 1:2], x[:, 1:2, -2:-1]], axis=2)
    bot_in = jnp.concatenate([x[:, -2:-1, 1:2], x[:, -2:-1], x[:, -2:-1, -2:-1]], axis=2)
    left_in = jnp.pad(
        jnp.transpose(x[:, :, 1:2], (0, 2, 1, 3)), ((0, 0), (0, 0), (1, 1), (0, 0))
    )
    right_in = jnp.pad(
        jnp.transpose(x[:, :, -2:-1], (0, 2, 1, 3)), ((0, 0), (0, 0), (1, 1), (0, 0))
    )
    strips = jnp.concatenate(
        [to_len(top_in), to_len(bot_in), to_len(left_in), to_len(right_in)], axis=-1
    )  # [B, 1, L+2, 4C]
    # group kernels: rows use kernel rows w[0]/w[2]; transposed columns use
    # kernel columns w[:,0]/w[:,2] laid along the strip axis
    wg = jnp.concatenate(
        [wk[0:1], wk[2:3], jnp.transpose(wk[:, 0:1], (1, 0, 2, 3)),
         jnp.transpose(wk[:, 2:3], (1, 0, 2, 3))], axis=3,
    )  # [1, 3, C, 4*Cout]
    corr = jax.lax.conv_general_dilated(
        strips, wg, window_strides=(1, 1), padding="VALID",
        dimension_numbers=_DN, feature_group_count=4,
        preferred_element_type=preferred,
    )  # [B, 1, L, 4*Cout]

    # --- fold the strips back via broadcast-selects (these fuse into the
    # consumer elementwise pass; DUS serialized and pad-to-full materialized
    # full arrays — both measured slower than the reflect pad itself) ------
    top = corr[:, :, :w_in, :cout]                      # [B, 1, W, Cout]
    bot = corr[:, :, :w_in, cout : 2 * cout]
    left = jnp.transpose(corr[:, :, :h, 2 * cout : 3 * cout], (0, 2, 1, 3))
    right = jnp.transpose(corr[:, :, :h, 3 * cout :], (0, 2, 1, 3))  # [B, H, 1, Cout]

    ri = jnp.arange(h)[:, None, None]
    ci = jnp.arange(w_in)[:, None]
    zero = jnp.zeros((), y.dtype)
    y = y + jnp.where(ri == 0, top, zero) + jnp.where(ri == h - 1, bot, zero)
    y = y + jnp.where(ci == 0, left, zero) + jnp.where(ci == w_in - 1, right, zero)
    return y


def conv2d(
    x: jax.Array,
    params: Params,
    stride: int = 1,
    padding: int = 0,
    pad_mode: str = "reflect",
) -> jax.Array:
    """Conv2d with explicit (default reflect) padding, matching torch
    ``nn.Conv2d(..., padding_mode='reflect')`` (``base_layers.py:140``)."""
    w = params["weight"]
    if (
        REFLECT_FAST_PATH
        and pad_mode == "reflect"
        and padding == 1
        and stride == 1
        and w.shape[0] == w.shape[1] == 3
        # only worthwhile when the pad copy is expensive; on thin strips
        # (the fused-op border helpers) the strip machinery is pure overhead
        and x.shape[1] >= 16
        and x.shape[2] >= 16
    ):
        y = _reflect1_conv3x3(x, w)
        if "bias" in params:
            y = y + params["bias"].astype(y.dtype)
        return y.astype(x.dtype)
    if padding > 0:
        x = jnp.pad(
            x,
            ((0, 0), (padding, padding), (padding, padding), (0, 0)),
            mode=pad_mode if pad_mode != "zeros" else "constant",
        )
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    )
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y.astype(x.dtype)


_ACTIVATIONS = {
    None: lambda x: x,
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
}


def conv_layer(
    x: jax.Array,
    params: Params,
    stride: int = 1,
    padding: int = 0,
    activation: str | None = None,
) -> jax.Array:
    """Reference ``ConvLayer`` (:135-161): reflect conv + optional activation."""
    return _ACTIVATIONS[activation](conv2d(x, params, stride=stride, padding=padding))


# ---------------------------------------------------------------------------
# bilinear resize (both torch align_corners conventions)
# ---------------------------------------------------------------------------

def bilinear_resize(
    x: jax.Array, out_h: int, out_w: int, align_corners: bool = False
) -> jax.Array:
    """Bilinear resize of NHWC input.

    ``align_corners=False`` matches torch ``F.interpolate(mode='bilinear')``
    (half-pixel centers == ``jax.image.resize``); ``align_corners=True``
    matches the Super-SloMo decoder convention.
    """
    n, h, w, c = x.shape
    if not align_corners:
        return jax.image.resize(x, (n, out_h, out_w, c), method="linear")

    def axis_coords(out_size, in_size):
        if out_size == 1 or in_size == 1:
            return jnp.zeros((out_size,), jnp.float32)
        scale = (in_size - 1) / (out_size - 1)
        return jnp.arange(out_size, dtype=jnp.float32) * scale

    ys = axis_coords(out_h, h)
    xs = axis_coords(out_w, w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0.astype(jnp.float32))[None, :, None, None]
    wx = (xs - x0.astype(jnp.float32))[None, None, :, None]

    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return (top * (1 - wy) + bot * wy).astype(x.dtype)


def upsample_conv_layer(
    x: jax.Array,
    params: Params,
    kernel_size: int = 3,
    activation: str | None = None,
    out_hw: tuple[int, int] | None = None,
) -> jax.Array:
    """Reference ``UpsampleConvLayer`` (:166-210): bilinear 2x upsample
    (align_corners=False) -> reflection pad (k-1)/2 -> valid conv."""
    n, h, w, c = x.shape
    out_h, out_w = (2 * h, 2 * w) if out_hw is None else out_hw
    x = bilinear_resize(x, out_h, out_w, align_corners=False)
    pad = (kernel_size - 1) // 2
    return _ACTIVATIONS[activation](conv2d(x, params, stride=1, padding=pad))


# ---------------------------------------------------------------------------
# recurrent cells
# ---------------------------------------------------------------------------

def conv_lstm_init(key: jax.Array, input_size: int, hidden_size: int, k: int = 3) -> Params:
    return {"Gates": conv_init(key, input_size + hidden_size, 4 * hidden_size, k)}


def conv_lstm_step(
    params: Params,
    x: jax.Array,
    state: tuple[jax.Array, jax.Array],
    k: int = 3,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """ConvLSTM step (``base_layers.py:75-130``).

    ``state = (hidden, cell)``; gate channel order is torch's
    (in, remember, out, cell). Designed as a ``lax.scan`` body.
    """
    hidden, cell = state
    gates = conv2d(jnp.concatenate([x, hidden], axis=-1), params["Gates"], padding=k // 2)
    in_g, rem_g, out_g, cell_g = jnp.split(gates, 4, axis=-1)
    in_g = jax.nn.sigmoid(in_g)
    rem_g = jax.nn.sigmoid(rem_g)
    out_g = jax.nn.sigmoid(out_g)
    cell_g = jnp.tanh(cell_g)
    cell = rem_g * cell + in_g * cell_g
    hidden = out_g * jnp.tanh(cell)
    return hidden, (hidden, cell)


def conv_lstm_zero_state(batch: int, h: int, w: int, hidden_size: int, dtype=jnp.float32):
    z = jnp.zeros((batch, h, w, hidden_size), dtype)
    return (z, z)


def conv_lstc_init(
    key: jax.Array, x_size: int, z_size: int, output_size: int, k: int = 3
) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "gates": conv_init(k1, x_size + z_size, 2 * output_size, k),
        "out_gates": conv_init(k2, z_size + output_size, output_size, k),
        "P0": conv_init(k3, x_size, output_size, k),
    }


def conv_lstc_step(
    params: Params,
    x: jax.Array,
    z: jax.Array,
    prev_cell: jax.Array,
    k: int = 3,
) -> tuple[jax.Array, jax.Array]:
    """ConvLSTC step for sparse codes (``base_layers.py:38-71``).

    in/forget gates from cat(x, z); candidate ``z0 = P0(x)``; out gate from
    cat(z0, z); ``cell = forget*prev_cell + in*z0``;
    ``out = out_gate * tanh(cell)``. Returns ``(out, cell)``.
    """
    pad = k // 2
    gates = conv2d(jnp.concatenate([x, z], axis=-1), params["gates"], padding=pad)
    in_g, forget_g = jnp.split(gates, 2, axis=-1)
    in_g = jax.nn.sigmoid(in_g)
    forget_g = jax.nn.sigmoid(forget_g)
    z0 = conv2d(x, params["P0"], padding=pad)
    out_g = jax.nn.sigmoid(
        conv2d(jnp.concatenate([z0, z], axis=-1), params["out_gates"], padding=pad)
    )
    cell = forget_g * prev_cell + in_g * z0
    out = out_g * jnp.tanh(cell)
    return out, cell


def conv_lstc_fuse(params: Params) -> Params:
    """Precompute fused two-pass kernels for ``conv_lstc_step`` (exact).

    The cell's three 3x3 convs all draw on ``x``/``z`` (``base_layers.py:
    38-71``): ``gates`` on cat(x, z), ``P0`` on x, ``out_gates`` on
    cat(z0, z). Reflect padding is per-channel and conv is linear, so:

    - pass 1 = ONE conv over cat(x, z) emitting ``[gates | z0 | og_z]``
      (P0's kernel zero-padded over the z channels; out_gates' z-half
      zero-padded over the x channels) — x and z are each read once;
    - pass 2 = conv over z0 with out_gates' z0-half, added to the
      precomputed ``og_z`` partial (the cat(z0, z) buffer never exists).

    ~27% more MXU FLOPs from the zero blocks for 3 convs + 2 concats ->
    2 convs + 1 concat. MEASURED SLOWER on v5e (bf16 b=8 at 90x120: 1.35 ms
    vs 0.94 ms for the 3-conv cell): these convs already sustain ~76% of
    bf16 MXU peak, so the extra FLOPs cost more than the saved launch —
    kept as an opt-in (``CistaConfig.lstc_impl='fused'``) negative result.
    Gradients flow through the concat/pad back to the stored convs, so the
    checkpoint format (gates/P0/out_gates) is unchanged.
    """
    wg = params["gates"]["weight"]  # [3,3, x+z, 2*out]
    wp = params["P0"]["weight"]  # [3,3, x, out]
    wo = params["out_gates"]["weight"]  # [3,3, z0+z, out]
    x_ch = wp.shape[2]
    cin = wg.shape[2]  # x + z
    out = wp.shape[3]
    z_ch = cin - x_ch

    p0_blk = jnp.pad(wp, ((0, 0), (0, 0), (0, z_ch), (0, 0)))
    og_z_blk = jnp.pad(wo[:, :, out:], ((0, 0), (0, 0), (x_ch, 0), (0, 0)))
    w1 = jnp.concatenate([wg, p0_blk, og_z_blk], axis=3)
    b1 = jnp.concatenate(
        [
            params["gates"]["bias"],
            params["P0"]["bias"],
            jnp.zeros((out,), params["P0"]["bias"].dtype),
        ]
    )
    return {
        "W1": {"weight": w1, "bias": b1},
        "W2": {"weight": wo[:, :, :out], "bias": params["out_gates"]["bias"]},
    }


def conv_lstc_step_fused(
    fused: Params,
    x: jax.Array,
    z: jax.Array,
    prev_cell: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """``conv_lstc_step`` via the fused kernels from ``conv_lstc_fuse``."""
    # output width from the (static) pass-2 kernel shape — ints must not
    # live in the pytree (checkpoint/scan would trace them)
    out = fused["W2"]["weight"].shape[3]
    y1 = conv2d(jnp.concatenate([x, z], axis=-1), fused["W1"], padding=1)
    in_g = jax.nn.sigmoid(y1[..., :out])
    forget_g = jax.nn.sigmoid(y1[..., out : 2 * out])
    z0 = y1[..., 2 * out : 3 * out]
    og_partial = y1[..., 3 * out :]
    out_g = jax.nn.sigmoid(conv2d(z0, fused["W2"], padding=1) + og_partial)
    cell = forget_g * prev_cell + in_g * z0
    return out_g * jnp.tanh(cell), cell


# ---------------------------------------------------------------------------
# torch checkpoint conversion helper
# ---------------------------------------------------------------------------

def torch_conv_to_hwio(weight: np.ndarray) -> np.ndarray:
    """torch OIHW conv weight -> HWIO."""
    return np.transpose(weight, (2, 3, 1, 0))
