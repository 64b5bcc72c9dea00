"""Exact algebraic fusion of the CISTA nets' full-resolution convolutions.

Motivation (measured on TPU v5e, `scripts/bench_e2v_stages.py`): the
half-resolution ISTA core runs at ~83 TFLOP/s while the full-resolution
stages (heads, bilinear-upsample conv, final conv) crawl at ~5 TFLOP/s —
tiny channel counts (5/1/64->1) starve the 128-lane MXU and the full-res
64-channel intermediates dominate HBM traffic. All three stages are LINEAR
up to their trailing activation (reference ``ConvLayer`` default activation
is None, ``e2v/base_layers.py:136``), so they admit exact rewrites in the
half-resolution / space-to-depth (parity) domain — the standard TPU
treatment for low-channel full-res convs:

- **heads**: ``W0(R(cat(We(R(ev)), Wi(R(img)))))`` (R = reflect-pad-1) is a
  single composed 5x5 stride-2 conv in the interior; the 1-block border
  rows/cols (where R of the *intermediate* differs from any input padding)
  are recomputed exactly with the original two-stage math on thin strips.
- **bilinear2x + reflect conv3x3**: each output parity class (p, q) of the
  full-res result is an independent 3x3 conv over the half-res input
  (bilinear taps folded into the kernel), emitted parity-PACKED
  ``[B, H/2, W/2, 4C]`` so the full-res 64-channel map never exists in HBM;
  borders (bilinear edge clamp + reflect pad of the never-materialized
  upsampled map) come from the original op on 4-row/col slices.
- **final 3x3 conv (C -> 1)**: consumed directly in the parity domain as a
  3x3 block conv ``4C -> 4`` + depth-to-space. Reflect padding of the
  full-res input maps exactly onto parity-channel swaps of the border
  blocks, so this stage needs no strips at all.

Every function here is verified against the reference-faithful path to
fp32 tolerance in ``tests/test_fused.py``, and the end-to-end step remains
pinned to the genuine torch reference by ``tests/test_reference_parity.py``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]

_DN = ("NHWC", "HWIO", "NHWC")

# bilinear 2x taps (torch align_corners=False, interior):
#   out[2k]   = 0.25*in[k-1] + 0.75*in[k]
#   out[2k+1] = 0.75*in[k]   + 0.25*in[k+1]
_BILINEAR_TAPS = {0: ((-1, 0.25), (0, 0.75)), 1: ((0, 0.75), (1, 0.25))}


def space_to_depth(x: jax.Array) -> jax.Array:
    """[B, 2K, 2L, C] -> [B, K, L, 4C]; channel order (p, q, c), c fastest."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jax.Array) -> jax.Array:
    """Inverse of ``space_to_depth``."""
    b, k, l, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, k, l, 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, 2 * k, 2 * l, c)


def _conv(x, w, stride=(1, 1), out_dtype=None):
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding="VALID",
        dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    )
    return y.astype(out_dtype or x.dtype)


# ---------------------------------------------------------------------------
# heads: We|Wi + stride-2 W0 -> composed 5x5/s2 conv + exact border strips
# ---------------------------------------------------------------------------

def _merged_head_kernel(params: Params):
    """Block-diagonal merge of We (events) and Wi (prev image): one 3x3 conv
    over cat(events, image) — exact, since reflect padding is per-channel."""
    we, wi = params["We"]["weight"], params["Wi"]["weight"]
    nb, half = we.shape[2], we.shape[3]
    a = jnp.zeros((3, 3, nb + wi.shape[2], 2 * half), we.dtype)
    a = a.at[:, :, :nb, :half].set(we)
    a = a.at[:, :, nb:, half:].set(wi)
    b = jnp.concatenate([params["We"]["bias"], params["Wi"]["bias"]])
    return a, b


def _composed_heads_kernel(params: Params):
    """5x5 stride-2 kernel/bias for ``W0 ∘ (We|Wi)`` (interior-exact)."""
    a, b_a = _merged_head_kernel(params)
    w0 = params["W0"]["weight"].astype(jnp.float32)
    a32 = a.astype(jnp.float32)
    cin, cout = a.shape[2], w0.shape[3]
    k5 = jnp.zeros((5, 5, cin, cout), jnp.float32)
    for r1 in range(3):
        for r2 in range(3):
            k5 = k5.at[r1 : r1 + 3, r2 : r2 + 3].add(
                jnp.einsum("abim,mo->abio", a32, w0[r1, r2])
            )
    b5 = jnp.einsum("abmo,m->o", w0, b_a.astype(jnp.float32)) + params["W0"][
        "bias"
    ].astype(jnp.float32)
    return k5, b5


def _heads_two_stage(params: Params, x: jax.Array) -> jax.Array:
    """Reference-faithful two-stage heads on a (strip of) input — used for
    border rows/cols where the composed conv is inexact."""
    from .conv import conv_layer

    a, b = _merged_head_kernel(params)
    merged = {"weight": a, "bias": b}
    u = conv_layer(x, merged, padding=1)
    return conv_layer(u, params["W0"], stride=2, padding=1)


def precompute_fused_kernels(params: Params) -> Params:
    """Precompute all composed/parity kernels for one model-apply call.

    The kernel compositions (weight-space einsums / tap folds) are
    loop-invariant; computing them ONCE ahead of a ``lax.scan`` instead of
    inside every step body keeps the trace small and does not rely on XLA's
    while-loop LICM. Gradients flow through to the stored conv params.
    """
    return {
        "heads": _composed_heads_kernel(params),
        "upsamp": _upsample_parity_kernel(params["upsamp_conv"]),
        "final": _final_parity_kernel(params["final_conv"]),
    }


def heads_fused(
    params: Params, events: jax.Array, prev_image: jax.Array, kernels=None
) -> jax.Array:
    """Exact replacement for the heads pipeline (``e2v_model.py:62-66``):
    composed 5x5 stride-2 conv for the interior + two-stage strips for the
    single border row/col of the half-res output."""
    x = jnp.concatenate([events, prev_image], axis=-1)
    k5, b5 = kernels["heads"] if kernels else _composed_heads_kernel(params)

    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))  # borders overwritten
    y = _conv(xp, k5.astype(x.dtype), stride=(2, 2)) + b5.astype(x.dtype)

    # border strips (two-stage, exact): 6 input rows/cols -> 3 half-res
    # rows/cols of which the outer 1 is border-correct and rows 1..2 are
    # interior-agreeing; we take the outermost output row/col only.
    # top/bottom (left/right) share ONE batched call; overwrite via
    # where-chains (fuse; .at[].set serializes — see _reflect1_conv3x3).
    b = x.shape[0]
    tb = _heads_two_stage(params, jnp.concatenate([x[:, :6], x[:, -6:]], axis=0))
    top, bot = tb[:b, :1], tb[b:, -1:]
    lr = _heads_two_stage(
        params, jnp.concatenate([x[:, :, :6], x[:, :, -6:]], axis=0)
    )
    left, right = lr[:b, :, :1], lr[b:, :, -1:]

    h2, w2 = y.shape[1], y.shape[2]
    ri = jnp.arange(h2)[:, None, None]
    ci = jnp.arange(w2)[:, None]
    y = jnp.where(ri == 0, top, y)
    y = jnp.where(ri == h2 - 1, bot, y)
    y = jnp.where(ci == 0, left, y)
    y = jnp.where(ci == w2 - 1, right, y)
    return y


# ---------------------------------------------------------------------------
# bilinear 2x + reflect conv3x3 -> parity-packed half-res conv
# ---------------------------------------------------------------------------

def _upsample_parity_kernel(params: Params):
    """[3, 3, C, 4C] kernel computing all four parity classes of
    ``conv3x3(reflect_pad(bilinear2x(h)))`` in one half-res conv (interior)."""
    w = params["weight"].astype(jnp.float32)  # [3,3,Cin,Cout]
    cin, cout = w.shape[2], w.shape[3]
    ks = []
    for p in (0, 1):
        for q in (0, 1):
            k = jnp.zeros((3, 3, cin, cout), jnp.float32)
            for r1 in range(-1, 2):
                for r2 in range(-1, 2):
                    m1, pr1 = divmod(p + r1, 2)
                    m2, pr2 = divmod(q + r2, 2)
                    for d1, c1 in _BILINEAR_TAPS[pr1]:
                        for d2, c2 in _BILINEAR_TAPS[pr2]:
                            k = k.at[m1 + d1 + 1, m2 + d2 + 1].add(
                                c1 * c2 * w[r1 + 1, r2 + 1]
                            )
            ks.append(k)
    kk = jnp.stack(ks, axis=3)  # [3,3,Cin,4,Cout]
    kk = kk.reshape(3, 3, cin, 4 * cout)
    bb = jnp.tile(params["bias"].astype(jnp.float32), 4)
    return kk, bb


def upsample_conv_parity(
    params: Params, h: jax.Array, activation: str | None = None, kernels=None
) -> jax.Array:
    """Exact ``upsample_conv_layer`` emitting parity-PACKED output
    ``[B, H/2, W/2, 4C]`` (the full-res map never materializes).

    Border blocks (bilinear edge clamp + reflect pad of the upsampled map)
    are recomputed with the original op on 4-row/col slices.
    """
    from .conv import _ACTIVATIONS, upsample_conv_layer

    kk, bb = kernels["upsamp"] if kernels else _upsample_parity_kernel(params)
    hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))  # borders overwritten
    y = _conv(hp, kk.astype(h.dtype)) + bb.astype(h.dtype)

    b, hh, wh = h.shape[0], h.shape[1], h.shape[2]
    # border slices: original op, exact within the outermost output block.
    # top/bottom (and left/right) batch into ONE call each — half the
    # resize/pad/conv launches vs four separate strip calls
    tb = upsample_conv_layer(
        jnp.concatenate([h[:, :4], h[:, -4:]], axis=0), params,
        out_hw=(8, 2 * wh),
    )
    top = space_to_depth(tb[:b, :2])
    bot = space_to_depth(tb[b:, -2:])
    lr = upsample_conv_layer(
        jnp.concatenate([h[:, :, :4], h[:, :, -4:]], axis=0), params,
        out_hw=(2 * hh, 8),
    )
    left = space_to_depth(lr[:b, :, :2])
    right = space_to_depth(lr[b:, :, -2:])

    # overwrite via where-chains (fuse into one elementwise pass; .at[].set
    # lowered to serialized dynamic-update-slices — measured slower, see
    # _reflect1_conv3x3). Order matters: corners belong to left/right.
    ri = jnp.arange(hh)[:, None, None]
    ci = jnp.arange(wh)[:, None]
    y = jnp.where(ri == 0, top, y)
    y = jnp.where(ri == hh - 1, bot, y)
    y = jnp.where(ci == 0, left, y)
    y = jnp.where(ci == wh - 1, right, y)
    return _ACTIVATIONS[activation](y)


# ---------------------------------------------------------------------------
# final reflect conv3x3 (C -> Cout) consumed in the parity domain
# ---------------------------------------------------------------------------

def _final_parity_kernel(params: Params):
    """[3, 3, 4C, 4*Cout] block kernel equal to a full-res 3x3 conv."""
    w = params["weight"].astype(jnp.float32)  # [3,3,C,Cout]
    c, cout = w.shape[2], w.shape[3]
    ks = []
    for p in (0, 1):
        for q in (0, 1):
            k = jnp.zeros((3, 3, 4 * c, cout), jnp.float32)
            for r1 in range(-1, 2):
                for r2 in range(-1, 2):
                    m1, pr1 = divmod(p + r1, 2)
                    m2, pr2 = divmod(q + r2, 2)
                    pc = pr1 * 2 + pr2
                    k = k.at[m1 + 1, m2 + 1, pc * c : (pc + 1) * c].add(
                        w[r1 + 1, r2 + 1]
                    )
            ks.append(k)
    kk = jnp.stack(ks, axis=3).reshape(3, 3, 4 * c, 4 * cout)
    bb = jnp.tile(params["bias"].astype(jnp.float32), 4)
    return kk, bb


def _reflect_pad_parity(y: jax.Array) -> jax.Array:
    """Parity-domain equivalent of reflect-padding the FULL-RES map by 1.

    Full-res row -1 == row 1 == parity-1 of block 0 (and symmetrically), so
    each pad block carries the mirrored parity channels and zeros in the
    channels the 3x3 block kernel never reads.
    """
    b, hh, wh, c4 = y.shape
    c = c4 // 4

    def rows(sel_parity: int, src: jax.Array) -> jax.Array:
        # pad block row: parity `sel_parity` channels from src, rest zero
        out = jnp.zeros((b, 1, src.shape[2], c4), y.dtype)
        for q in (0, 1):
            pc = sel_parity * 2 + q
            out = out.at[..., pc * c : (pc + 1) * c].set(
                src[:, :, :, pc * c : (pc + 1) * c]
            )
        return out

    # vertical: full row -1 = parity-1 of block 0; full row 2*hh = parity-0
    # of block hh-1
    yv = jnp.concatenate(
        [rows(1, y[:, :1]), y, rows(0, y[:, -1:])], axis=1
    )

    def cols(sel_parity: int, src: jax.Array) -> jax.Array:
        out = jnp.zeros((b, src.shape[1], 1, c4), y.dtype)
        for p in (0, 1):
            pc = p * 2 + sel_parity
            out = out.at[..., pc * c : (pc + 1) * c].set(
                src[:, :, :, pc * c : (pc + 1) * c]
            )
        return out

    return jnp.concatenate(
        [cols(1, yv[:, :, :1]), yv, cols(0, yv[:, :, -1:])], axis=2
    )


def final_conv_parity(params: Params, y_parity: jax.Array, kernels=None) -> jax.Array:
    """Exact full-res reflect conv3x3 applied to a parity-packed input;
    returns the FULL-RES result (depth-to-space applied)."""
    kk, bb = kernels["final"] if kernels else _final_parity_kernel(params)
    yp = _reflect_pad_parity(y_parity)
    out = _conv(yp, kk.astype(y_parity.dtype)) + bb.astype(y_parity.dtype)
    return depth_to_space(out)
