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


def _conv(x, w, stride=(1, 1), out_dtype=None, padding="VALID"):
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding=padding,
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
    final = _final_parity_kernel(params["final_conv"])
    return {
        "heads": _composed_heads_kernel(params),
        "heads_parity": _heads_parity_kernel(params),
        "heads_borders": _heads_border_kernels(params),
        "upsamp": _upsample_parity_kernel(params["upsamp_conv"]),
        "upsamp_borders": _up_border_kernels(params["upsamp_conv"]),
        "final": final,
        "final_borders": _final_border_kernels(params["final_conv"], parity=final),
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


# ---------------------------------------------------------------------------
# Analytic BORDER kernels (round 3).
#
# The strip-based border fixups above (original op on thin slices -> s2d ->
# where) cost MORE than the interior convs they correct (measured b=16 bf16:
# up interior 0.53 ms vs up total 1.19 ms — scripts/bench_decoder_experiment).
# Every border value is LINEAR in a tiny input patch, so each edge admits its
# own folded kernel (one thin conv per edge) and each corner a dense matrix
# (one einsum), derived in weight space exactly like the interior folds:
#
# - bilinear align_corners=False edge rows: U[0]=h[0], U[1]=.75h[0]+.25h[1],
#   U[2]=.25h[0]+.75h[1], U[2n-1]=h[n-1] (torch clamps the out-of-range tap);
# - reflect pad of the never-materialized full-res map: row -1 == row 1,
#   row 2n == row 2n-2;
# - heads: reflect-pad-1 of the input and of the merged intermediate fold
#   into composed border kernels exactly as the interior 5x5 does.
#
# tests/test_fused.py pins every edge/corner against the strip paths (which
# are themselves pinned against the reference-faithful ops).
# ---------------------------------------------------------------------------

# coefficient taps of the reflect-padded upsampled map's border rows, in
# terms of the two edge rows of h. Key: full-res row R (top, h rows {0,1})
# or R-(2n-3) (bottom, h rows {n-2, n-1} as rel {0,1}).
_UP_EDGE0_TAPS = {
    -1: ((0, 0.75), (1, 0.25)),  # reflect: full row -1 == full row 1
    0: ((0, 1.0),),              # bilinear edge clamp: U[0] = h[0]
    1: ((0, 0.75), (1, 0.25)),
    2: ((0, 0.25), (1, 0.75)),
}
_UP_EDGE1_TAPS = {
    0: ((0, 0.75), (1, 0.25)),   # R = 2n-3
    1: ((0, 0.25), (1, 0.75)),   # R = 2n-2
    2: ((1, 1.0),),              # R = 2n-1: U = h[n-1] (edge clamp)
    3: ((0, 0.25), (1, 0.75)),   # R = 2n: reflect == R = 2n-2
}


def _up_edge_kernel_h(w, taps, key_off):
    """[2, 3, Cin, 4Cout] kernel for a horizontal edge of the parity-packed
    upsample conv: height taps special (from ``taps``), width interior."""
    cin, cout = w.shape[2], w.shape[3]
    k = jnp.zeros((2, 3, cin, 4, cout), jnp.float32)
    for p in (0, 1):
        for q in (0, 1):
            for d1 in range(3):
                for r, cv in taps[p + d1 - 1 + key_off]:
                    for r2 in (-1, 0, 1):
                        m2, pr2 = divmod(q + r2, 2)
                        for d2, c2 in _BILINEAR_TAPS[pr2]:
                            k = k.at[r, m2 + d2 + 1, :, p * 2 + q, :].add(
                                cv * c2 * w[d1, r2 + 1]
                            )
    return k.reshape(2, 3, cin, 4 * cout)


def _up_edge_kernel_v(w, taps, key_off):
    """[3, 2, Cin, 4Cout]: width taps special, height interior."""
    cin, cout = w.shape[2], w.shape[3]
    k = jnp.zeros((3, 2, cin, 4, cout), jnp.float32)
    for p in (0, 1):
        for q in (0, 1):
            for r1 in (-1, 0, 1):
                m1, pr1 = divmod(p + r1, 2)
                for d1, c1 in _BILINEAR_TAPS[pr1]:
                    for d2 in range(3):
                        for s, cw in taps[q + d2 - 1 + key_off]:
                            k = k.at[m1 + d1 + 1, s, :, p * 2 + q, :].add(
                                c1 * cw * w[r1 + 1, d2]
                            )
    return k.reshape(3, 2, cin, 4 * cout)


def _up_corner_kernel(w, taps_h, off_h, taps_w, off_w):
    """[2, 2, Cin, 4Cout]: both axes special — a dense corner map."""
    cin, cout = w.shape[2], w.shape[3]
    k = jnp.zeros((2, 2, cin, 4, cout), jnp.float32)
    for p in (0, 1):
        for q in (0, 1):
            for d1 in range(3):
                for r, cv in taps_h[p + d1 - 1 + off_h]:
                    for d2 in range(3):
                        for s, cw in taps_w[q + d2 - 1 + off_w]:
                            k = k.at[r, s, :, p * 2 + q, :].add(
                                cv * cw * w[d1, d2]
                            )
    return k.reshape(2, 2, cin, 4 * cout)


def _up_border_kernels(params: Params):
    w = params["weight"].astype(jnp.float32)
    e0, e1 = _UP_EDGE0_TAPS, _UP_EDGE1_TAPS
    return {
        "top": _up_edge_kernel_h(w, e0, 0),
        "bot": _up_edge_kernel_h(w, e1, 1),
        "left": _up_edge_kernel_v(w, e0, 0),
        "right": _up_edge_kernel_v(w, e1, 1),
        "tl": _up_corner_kernel(w, e0, 0, e0, 0),
        "tr": _up_corner_kernel(w, e0, 0, e1, 1),
        "bl": _up_corner_kernel(w, e1, 1, e0, 0),
        "br": _up_corner_kernel(w, e1, 1, e1, 1),
    }


def _corner_apply(patch: jax.Array, k: jax.Array) -> jax.Array:
    """[B, r, s, Cin] x [r, s, Cin, Cout] -> [B, Cout] (f32 accumulate)."""
    out = jnp.einsum(
        "brsi,rsio->bo", patch, k.astype(patch.dtype),
        preferred_element_type=jnp.float32,
    )
    return out.astype(patch.dtype)


def _set_strip_ends(strip: jax.Array, first: jax.Array, last: jax.Array) -> jax.Array:
    """Overwrite row 0 / row -1 of a ``[B, H, 1, C]`` column strip with
    ``[B, C]`` corner values via iota-selects.

    A ``.at[:, :1, 0].set`` here lowers to an XLA scatter; under a
    batch-sharded mesh the SPMD partitioner cannot reshard that scatter and
    falls back to "involuntary full rematerialization" (replicate +
    repartition) in the BPTT backward — the multichip compile blows up. The
    ``where`` select is elementwise and shards cleanly. Value-identical.
    """
    rr = jnp.arange(strip.shape[1])[:, None, None]
    strip = jnp.where(rr == 0, first[:, None, None, :], strip)
    return jnp.where(rr == strip.shape[1] - 1, last[:, None, None, :], strip)


def upsample_conv_parity_edgek(
    params: Params, h: jax.Array, activation: str | None = None, kernels=None
) -> jax.Array:
    """Exact ``upsample_conv_layer`` in the parity domain with analytic
    border kernels: one SAME conv + 4 thin edge convs + 4 corner einsums."""
    from .conv import _ACTIVATIONS

    kk, bb = kernels["upsamp"] if kernels else _upsample_parity_kernel(params)
    bk = (kernels or {}).get("upsamp_borders") or _up_border_kernels(params)
    bbt = bb.astype(h.dtype)
    y = _conv(h, kk, padding=((1, 1), (1, 1))) + bbt
    top = _conv(h[:, :2], bk["top"], padding=((0, 0), (1, 1))) + bbt
    bot = _conv(h[:, -2:], bk["bot"], padding=((0, 0), (1, 1))) + bbt
    left = _conv(h[:, :, :2], bk["left"], padding=((1, 1), (0, 0))) + bbt
    right = _conv(h[:, :, -2:], bk["right"], padding=((1, 1), (0, 0))) + bbt

    tl = _corner_apply(h[:, :2, :2], bk["tl"]) + bbt
    tr = _corner_apply(h[:, :2, -2:], bk["tr"]) + bbt
    bl = _corner_apply(h[:, -2:, :2], bk["bl"]) + bbt
    br = _corner_apply(h[:, -2:, -2:], bk["br"]) + bbt
    # corners ride the left/right strips (cols win the where order below)
    left = _set_strip_ends(left, tl, bl)
    right = _set_strip_ends(right, tr, br)

    hh, wh = h.shape[1], h.shape[2]
    ri = jnp.arange(hh)[:, None, None]
    ci = jnp.arange(wh)[:, None]
    y = jnp.where(ri == 0, top, y)
    y = jnp.where(ri == hh - 1, bot, y)
    y = jnp.where(ci == 0, left, y)
    y = jnp.where(ci == wh - 1, right, y)
    return _ACTIVATIONS[activation](y)


def _final_border_kernels(params: Params, parity=None):
    """Additive border corrections for the parity-domain final conv.

    ``_reflect_pad_parity`` materializes a padded copy of the 4C map; but the
    pad blocks are just parity-channel selections of the edge blocks, so the
    SAME-padded block conv only MISSES additive terms: per edge, the block
    kernel's outer tap applied to the masked edge row/col; per corner, one
    dense tap on one parity group of the corner block.
    """
    kk, _ = parity if parity is not None else _final_parity_kernel(params)
    c = kk.shape[2] // 4

    def keep(k, groups):
        m = jnp.zeros((kk.shape[2],), jnp.float32)
        for pc in groups:
            m = m.at[pc * c : (pc + 1) * c].set(1.0)
        return k * m[None, None, :, None]

    return {
        # full row -1 == parity p=1 of block row 0 -> keep pc in {2, 3}
        "top": keep(kk[0:1], (2, 3)),
        "bot": keep(kk[2:3], (0, 1)),
        "left": keep(kk[:, 0:1], (1, 3)),
        "right": keep(kk[:, 2:3], (0, 2)),
        # corner pads select a single parity group of the corner block
        "tl": kk[0, 0, 3 * c : 4 * c],  # (p,q)=(1,1)
        "tr": kk[0, 2, 2 * c : 3 * c],  # (1,0)
        "bl": kk[2, 0, 1 * c : 2 * c],  # (0,1)
        "br": kk[2, 2, 0 * c : 1 * c],  # (0,0)
    }


def final_conv_parity_edgek(
    params: Params, y_parity: jax.Array, kernels=None, packed: bool = False
) -> jax.Array:
    """Exact full-res reflect conv3x3 on a parity-packed input, without the
    materialized ``_reflect_pad_parity`` copy: SAME conv + additive edge
    convs + corner terms; returns the FULL-RES result (or the parity-packed
    ``[B, H/2, W/2, 4*Cout]`` result when ``packed`` — the parity-domain
    recurrence feeds it straight back into ``heads_parity_edgek``)."""
    kk, bb = kernels["final"] if kernels else _final_parity_kernel(params)
    fb = (kernels or {}).get("final_borders") or _final_border_kernels(
        params, parity=(kk, bb)
    )
    y = y_parity
    out = _conv(y, kk, padding=((1, 1), (1, 1))) + bb.astype(y.dtype)
    # additive border corrections folded in with iota-masked where-adds
    # (an ``.at[].add`` lowers to an XLA scatter that the SPMD partitioner
    # cannot reshard under a batch-sharded mesh — see _set_strip_ends; the
    # masked adds fuse into one elementwise pass)
    h2, w2 = y.shape[1], y.shape[2]
    ri = jnp.arange(h2)[:, None, None]
    ci = jnp.arange(w2)[:, None]
    zero = jnp.zeros((), out.dtype)
    out = out + jnp.where(
        ri == 0, _conv(y[:, :1], fb["top"], padding=((0, 0), (1, 1))), zero
    )
    out = out + jnp.where(
        ri == h2 - 1, _conv(y[:, -1:], fb["bot"], padding=((0, 0), (1, 1))), zero
    )
    out = out + jnp.where(
        ci == 0, _conv(y[:, :, :1], fb["left"], padding=((1, 1), (0, 0))), zero
    )
    out = out + jnp.where(
        ci == w2 - 1, _conv(y[:, :, -1:], fb["right"], padding=((1, 1), (0, 0))), zero
    )

    c = kk.shape[2] // 4

    def corner(val, k):  # [B, c] x [c, 4Cout] -> [B, 1, 1, 4Cout]
        r = jnp.einsum("bi,io->bo", val, k.astype(val.dtype),
                       preferred_element_type=jnp.float32)
        return r.astype(val.dtype)[:, None, None, :]

    out = out + jnp.where(
        (ri == 0) & (ci == 0), corner(y[:, 0, 0, 3 * c :], fb["tl"]), zero
    )
    out = out + jnp.where(
        (ri == 0) & (ci == w2 - 1), corner(y[:, 0, -1, 2 * c : 3 * c], fb["tr"]), zero
    )
    out = out + jnp.where(
        (ri == h2 - 1) & (ci == 0), corner(y[:, -1, 0, c : 2 * c], fb["bl"]), zero
    )
    out = out + jnp.where(
        (ri == h2 - 1) & (ci == w2 - 1), corner(y[:, -1, -1, : c], fb["br"]), zero
    )
    return out if packed else depth_to_space(out)


# ---------------------------------------------------------------------------
# heads border kernels: the two-stage reflect-pad composition folded per edge
# ---------------------------------------------------------------------------

def _heads_row_top(s, t):
    """x-row index (into x[0:3]) read by composed tap (W0-tap s, merged-tap
    t) at the TOP half-res output row: reflect-pad-1 of the merged map
    (row -1 -> 1) then reflect-pad-1 of the input."""
    m = 1 if s - 1 == -1 else s - 1      # merged row
    r = m - 1 + t                        # x row, in -1..2
    return 1 if r == -1 else r


def _heads_row_bot(s, t):
    """x-row index (into x[-4:]) at the BOTTOM output row: the merged map
    needs no pad there (it reads merged rows H-3..H-1) but merged row H-1
    reads x[H] -> reflect -> x[H-2]; base abs row H-4, rel = s + t."""
    r = s + t                            # rel x row in 0..4 (abs H-4 + r)
    return 2 if r == 4 else r            # abs H reflects to H-2 (rel 2)


def _heads_border_kernels(params: Params):
    """Edge kernels [rows, 5, Cin, Cout] (stride-2 width, interior) and
    corner tensors for the composed heads conv."""
    a, _ = _merged_head_kernel(params)
    a = a.astype(jnp.float32)
    w0 = params["W0"]["weight"].astype(jnp.float32)
    cin, cout = a.shape[2], w0.shape[3]

    def edge_h(row_map, nrows):
        k = jnp.zeros((nrows, 5, cin, cout), jnp.float32)
        for s1 in range(3):
            for t1 in range(3):
                r = row_map(s1, t1)
                for s2 in range(3):
                    for t2 in range(3):
                        k = k.at[r, s2 + t2].add(
                            jnp.einsum("im,mo->io", a[t1, t2], w0[s1, s2])
                        )
        return k

    def edge_v(col_map, ncols):
        k = jnp.zeros((5, ncols, cin, cout), jnp.float32)
        for s2 in range(3):
            for t2 in range(3):
                cidx = col_map(s2, t2)
                for s1 in range(3):
                    for t1 in range(3):
                        k = k.at[s1 + t1, cidx].add(
                            jnp.einsum("im,mo->io", a[t1, t2], w0[s1, s2])
                        )
        return k

    def corner(row_map, nrows, col_map, ncols):
        k = jnp.zeros((nrows, ncols, cin, cout), jnp.float32)
        for s1 in range(3):
            for t1 in range(3):
                r = row_map(s1, t1)
                for s2 in range(3):
                    for t2 in range(3):
                        k = k.at[r, col_map(s2, t2)].add(
                            jnp.einsum("im,mo->io", a[t1, t2], w0[s1, s2])
                        )
        return k

    return {
        "top": edge_h(_heads_row_top, 3),
        "bot": edge_h(_heads_row_bot, 4),
        "left": edge_v(_heads_row_top, 3),
        "right": edge_v(_heads_row_bot, 4),
        "tl": corner(_heads_row_top, 3, _heads_row_top, 3),
        "tr": corner(_heads_row_top, 3, _heads_row_bot, 4),
        "bl": corner(_heads_row_bot, 4, _heads_row_top, 3),
        "br": corner(_heads_row_bot, 4, _heads_row_bot, 4),
    }


def _heads_parity_kernel(params: Params):
    """[3, 3, 4*nb+4, Cout] kernel equal to the composed 5x5 stride-2 heads
    conv applied to PARITY-PACKED input (events ``space_to_depth``-packed at
    ``4*nb`` channels followed by the packed prev image at 4 channels).

    A stride-2 5x5 conv reads full-res taps ``2i+u-2``; writing
    ``u-2 = 2a+p`` maps every tap onto a 3x3 neighborhood of parity blocks,
    so the composed kernel is a pure reindex of ``k5`` — no arithmetic, and
    the full-resolution input never needs to exist.
    """
    k5, b5 = _composed_heads_kernel(params)  # [5,5, nb+1, cout]
    cin, cout = k5.shape[2], k5.shape[3]
    nb = cin - 1
    kp = jnp.zeros((3, 3, 4 * nb + 4, cout), jnp.float32)
    for u in range(5):
        a, p = divmod(u - 2, 2)
        for v in range(5):
            b_, q = divmod(v - 2, 2)
            pc = p * 2 + q
            kp = kp.at[a + 1, b_ + 1, pc * nb : (pc + 1) * nb].set(k5[u, v, :nb])
            kp = kp.at[a + 1, b_ + 1, 4 * nb + pc].set(k5[u, v, nb])
    return kp, b5


def heads_parity_edgek(
    params: Params, ev_parity: jax.Array, img_parity: jax.Array, kernels=None
) -> jax.Array:
    """Exact heads pipeline on PARITY-PACKED inputs: one SAME 3x3 conv over
    ``[B, H/2, W/2, 4*nb+4]`` + the analytic border kernels applied to thin
    strips reassembled from the edge parity blocks.

    With the final conv emitting packed output (``final_conv_parity_edgek``
    ``packed=True``) the recurrence's full-resolution maps never touch HBM;
    the 6-channel full-res conv that starved the MXU becomes a dense
    24-channel half-res conv.
    """
    kp, b5 = (
        kernels["heads_parity"] if kernels else _heads_parity_kernel(params)
    )
    hb = (kernels or {}).get("heads_borders") or _heads_border_kernels(params)
    xp = jnp.concatenate([ev_parity, img_parity], axis=-1)
    b5t = b5.astype(xp.dtype)
    y = _conv(xp, kp, padding=((1, 1), (1, 1))) + b5t

    # thin full-res strips for the border kernels (4 rows/cols each — two
    # parity block rows/cols); tiny d2s calls, borders only
    def strip(ev_sl, img_sl):
        return jnp.concatenate(
            [depth_to_space(ev_sl), depth_to_space(img_sl)], axis=-1
        )

    xt = strip(ev_parity[:, :2], img_parity[:, :2])        # full rows 0..3
    xb = strip(ev_parity[:, -2:], img_parity[:, -2:])      # rows H-4..H-1
    xl = strip(ev_parity[:, :, :2], img_parity[:, :, :2])  # full cols 0..3
    xr = strip(ev_parity[:, :, -2:], img_parity[:, :, -2:])

    top = _conv(xt[:, :3], hb["top"], stride=(1, 2), padding=((0, 0), (2, 2))) + b5t
    bot = _conv(xb, hb["bot"], stride=(1, 2), padding=((0, 0), (2, 2))) + b5t
    left = _conv(xl[:, :, :3], hb["left"], stride=(2, 1), padding=((2, 2), (0, 0))) + b5t
    right = _conv(xr, hb["right"], stride=(2, 1), padding=((2, 2), (0, 0))) + b5t

    tl = _corner_apply(xt[:, :3, :3], hb["tl"]) + b5t
    tr = _corner_apply(xt[:, :3, -4:], hb["tr"]) + b5t
    bl = _corner_apply(xb[:, :, :3], hb["bl"]) + b5t
    br = _corner_apply(xb[:, :, -4:], hb["br"]) + b5t
    left = _set_strip_ends(left, tl, bl)
    right = _set_strip_ends(right, tr, br)

    h2, w2 = y.shape[1], y.shape[2]
    ri = jnp.arange(h2)[:, None, None]
    ci = jnp.arange(w2)[:, None]
    y = jnp.where(ri == 0, top, y)
    y = jnp.where(ri == h2 - 1, bot, y)
    y = jnp.where(ci == 0, left, y)
    y = jnp.where(ci == w2 - 1, right, y)
    return y


def heads_fused_edgek(
    params: Params, events: jax.Array, prev_image: jax.Array, kernels=None
) -> jax.Array:
    """Exact heads pipeline via the composed 5x5/s2 conv + analytic border
    kernels (no two-stage strip recomputation)."""
    x = jnp.concatenate([events, prev_image], axis=-1)
    k5, b5 = kernels["heads"] if kernels else _composed_heads_kernel(params)
    hb = (kernels or {}).get("heads_borders") or _heads_border_kernels(params)
    b5t = b5.astype(x.dtype)

    y = _conv(x, k5, stride=(2, 2), padding=((2, 2), (2, 2))) + b5t
    top = _conv(x[:, :3], hb["top"], stride=(1, 2), padding=((0, 0), (2, 2))) + b5t
    bot = _conv(x[:, -4:], hb["bot"], stride=(1, 2), padding=((0, 0), (2, 2))) + b5t
    left = _conv(x[:, :, :3], hb["left"], stride=(2, 1), padding=((2, 2), (0, 0))) + b5t
    right = _conv(x[:, :, -4:], hb["right"], stride=(2, 1), padding=((2, 2), (0, 0))) + b5t

    tl = _corner_apply(x[:, :3, :3], hb["tl"]) + b5t
    tr = _corner_apply(x[:, :3, -4:], hb["tr"]) + b5t
    bl = _corner_apply(x[:, -4:, :3], hb["bl"]) + b5t
    br = _corner_apply(x[:, -4:, -4:], hb["br"]) + b5t
    left = _set_strip_ends(left, tl, bl)
    right = _set_strip_ends(right, tr, br)

    h2, w2 = y.shape[1], y.shape[2]
    ri = jnp.arange(h2)[:, None, None]
    ci = jnp.arange(w2)[:, None]
    y = jnp.where(ri == 0, top, y)
    y = jnp.where(ri == h2 - 1, bot, y)
    y = jnp.where(ci == 0, left, y)
    y = jnp.where(ci == w2 - 1, right, y)
    return y
