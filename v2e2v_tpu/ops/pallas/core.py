"""Fused CISTA half-res core Pallas kernel (ConvLSTC -> ISTA -> Dg -> LSTM).

The half-resolution core of a CISTA-LSTC step (reference ``e2v/e2v_model.py``
:68-84 — ConvLSTC cell, depth weight-tied ISTA iterations, decoder conv +
ConvLSTM) is 12 reflect-padded 3x3 convolutions at (H/2, W/2) with HBM
round-trips between every XLA op. This kernel keeps the whole plane AND the
recurrent state resident in VMEM for the step.

Design (vs the earlier ``ops/pallas/ista.py`` kernel, which measured only
56 TFLOP/s because of per-tap relayouts):

- activations live FLAT as ``[H*W, C]`` — rows on sublanes, channels on
  lanes. A conv tap shift ``(dy, dx)`` is then a plain offset slice of a
  row-padded ``[H*W + 2W + 2, C]`` scratch (sublane shift, no relayout,
  no reshape).
- reflect padding: vertical reflection is materialized in the scratch's
  top/bottom ``W`` rows; horizontal reflection is two masked selects per
  tap row (columns 0 / W-1 substitute the opposite-dx slice — exactly the
  torch ``padding_mode='reflect'`` corner composition).
- every conv is 9 ``[HW, Cin] x [Cin, Cout]`` MXU matmuls with float32
  accumulation; concat-input convs (gates on cat(x, z), out_gates on
  cat(z0, z), LSTM gates on cat(x, h)) are split by input so no channel
  concat ever materializes.
- the ISTA depth loop is a ``fori_loop`` (weight-tied), keeping the Mosaic
  program small; the iterate is carried in the ``z`` output ref.

Numerics: matmuls accumulate f32 over ``dtype`` (bf16/f32) activations and
the gate/cell algebra runs in f32, so the kernel is at least as precise as
the XLA path (which casts conv outputs to the activation dtype before the
elementwise ops); equality is pinned to bf16/f32 tolerance in
``tests/test_pallas_core.py``.

Used when ``CistaConfig.core_impl == 'pallas'`` (opt-in, like ``ista_impl``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = dict


def core_taps(params: Params, dtype=jnp.bfloat16) -> dict:
    """Precompute the kernel's tap/bias arrays from the model params.

    Concat-input convs are split per input (conv is linear in its input
    channels); weights reshape HWIO ``[3,3,Cin,Cout]`` -> ``[9,Cin,Cout]``.
    Gradients flow through to the stored conv params, so this can be built
    inside a jitted step.
    """
    c = params["We"]["weight"].shape[3] * 2  # base channels

    def taps(w):
        return w.reshape(9, w.shape[2], w.shape[3]).astype(dtype)

    def b(x):
        return x.reshape(1, -1).astype(jnp.float32)

    p0 = params["P0"]
    wg = p0["gates"]["weight"]  # [3,3, C+2C, 4C] (in|forget)
    wog = p0["out_gates"]["weight"]  # [3,3, 2C+2C, 2C]
    wl = params["Dg"]["lstm"]["Gates"]["weight"]  # [3,3, C+C, 4C]
    return {
        "wg_x": taps(wg[:, :, :c]),
        "wg_z": taps(wg[:, :, c:]),
        "b_g": b(p0["gates"]["bias"]),
        "w_p0": taps(p0["P0"]["weight"]),
        "b_p0": b(p0["P0"]["bias"]),
        "wog_z0": taps(wog[:, :, : 2 * c]),
        "wog_z": taps(wog[:, :, 2 * c :]),
        "b_og": b(p0["out_gates"]["bias"]),
        "w_d": taps(params["lista"]["D"]["weight"]),
        "b_d": b(params["lista"]["D"]["bias"]),
        "w_p": taps(params["lista"]["P"]["weight"]),
        "b_p": b(params["lista"]["P"]["bias"]),
        "lam": b(params["lista"]["Lambda"]),
        "w_dg": taps(params["Dg"]["conv"]["weight"]),
        "b_dg": b(params["Dg"]["conv"]["bias"]),
        "wl_x": taps(wl[:, :, :c]),
        "wl_h": taps(wl[:, :, c:]),
        "b_l": b(params["Dg"]["lstm"]["Gates"]["bias"]),
    }


def _pad_rows_into(pad_ref, x, w, hw):
    """Write flat ``x [HW, C]`` into ``pad_ref [HW + 2W + 2, C]`` with the
    VERTICAL reflection materialized (full-res row -1 == row 1, row H ==
    row H-2). The two end slots only back the (dy, dx) = (-1, -1)/(1, 1)
    corner slices, whose affected lanes are always replaced by the
    horizontal-reflect selects — they just need finite values."""
    pad_ref[w + 1 : w + 1 + hw, :] = x
    pad_ref[1 : w + 1, :] = x[w : 2 * w, :]
    pad_ref[0:1, :] = x[2 * w - 1 : 2 * w, :]
    pad_ref[w + 1 + hw : w + 1 + hw + w, :] = x[hw - 2 * w : hw - w, :]
    pad_ref[w + 1 + hw + w :, :] = x[hw - w : hw - w + 1, :]


def _conv3_flat(pad_ref, taps_ref, bias, col0, colw, w, hw):
    """Reflect conv3x3 over the row-padded flat plane: 9 offset slices,
    horizontal reflection as masked selects, f32 MXU accumulation."""
    acc = jnp.broadcast_to(bias, (hw, taps_ref.shape[2]))
    for dy in range(3):
        base = w + 1 + (dy - 1) * w
        s_l = pad_ref[pl.ds(base - 1, hw), :]
        s_m = pad_ref[pl.ds(base, hw), :]
        s_r = pad_ref[pl.ds(base + 1, hw), :]
        # full-res col -1 == col 1; col W == col W-2 (per tap row, on the
        # vertically-reflected content — corners compose like torch)
        t_l = jnp.where(col0, s_r, s_l)
        t_r = jnp.where(colw, s_l, s_r)
        acc = acc + jnp.dot(t_l, taps_ref[3 * dy], preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(s_m, taps_ref[3 * dy + 1], preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(t_r, taps_ref[3 * dy + 2], preferred_element_type=jnp.float32)
    return acc


def _softshrink(y, lam):
    return jax.nn.relu(y - lam) - jax.nn.relu(-y - lam)


def _core_kernel(
    depth, h, w, c, dtype,
    # inputs
    x1_ref, z_ref, cell_ref, hid_ref, hc_ref,
    wg_x, wg_z, b_g, w_p0, b_p0, wog_z0, wog_z, b_og,
    w_d, b_d, w_p, b_p, lam_ref, w_dg, b_dg, wl_x, wl_h, b_l,
    # outputs
    z_out, cell_out, hid_out, hc_out,
    # scratch
    pad_a, pad_b, pad_c, pad_d,
):
    hw = h * w
    col = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0) % w
    col0 = col == 0
    colw = col == w - 1

    conv = partial(_conv3_flat, col0=col0, colw=colw, w=w, hw=hw)

    x1 = x1_ref[0]
    z = z_ref[0]
    _pad_rows_into(pad_a, x1, w, hw)
    _pad_rows_into(pad_b, z, w, hw)

    # --- ConvLSTC (base_layers.py:38-71): gates on cat(x, z), candidate
    # z0 = P0(x), out gate on cat(z0, z) ---------------------------------
    gates = conv(pad_a, wg_x, b_g[0]) + conv(pad_b, wg_z, jnp.zeros((), jnp.float32))
    in_g = jax.nn.sigmoid(gates[:, : 2 * c])
    forget_g = jax.nn.sigmoid(gates[:, 2 * c :])
    z0 = conv(pad_a, w_p0, b_p0[0])
    _pad_rows_into(pad_c, z0.astype(dtype), w, hw)
    og = jax.nn.sigmoid(
        conv(pad_c, wog_z0, b_og[0]) + conv(pad_b, wog_z, jnp.zeros((), jnp.float32))
    )
    cell = forget_g * cell_ref[0].astype(jnp.float32) + in_g * z0
    cell_out[0] = cell.astype(dtype)
    z_out[0] = (og * jnp.tanh(cell)).astype(dtype)

    # --- ISTA x depth (weight-tied; e2v_model.py:72-78) -----------------
    lam = lam_ref[0].astype(jnp.float32)
    x1_f = x1.astype(jnp.float32)

    def body(_, carry):
        z_it = z_out[0]
        _pad_rows_into(pad_c, z_it, w, hw)
        tmp = conv(pad_c, w_d, b_d[0])  # [HW, C] f32
        _pad_rows_into(pad_a, (x1_f - tmp).astype(dtype), w, hw)
        y = conv(pad_a, w_p, b_p[0]) + z_it.astype(jnp.float32)
        z_out[0] = _softshrink(y, lam).astype(dtype)
        return carry

    jax.lax.fori_loop(0, depth, body, 0)

    # --- decoder: Dg conv + relu -> ConvLSTM (e2v_model.py:82-84) -------
    _pad_rows_into(pad_b, z_out[0], w, hw)
    xg = jax.nn.relu(conv(pad_b, w_dg, b_dg[0])).astype(dtype)
    _pad_rows_into(pad_a, xg, w, hw)
    _pad_rows_into(pad_d, hid_ref[0], w, hw)
    lg = conv(pad_a, wl_x, b_l[0]) + conv(pad_d, wl_h, jnp.zeros((), jnp.float32))
    i_g = jax.nn.sigmoid(lg[:, :c])
    r_g = jax.nn.sigmoid(lg[:, c : 2 * c])
    o_g = jax.nn.sigmoid(lg[:, 2 * c : 3 * c])
    c_g = jnp.tanh(lg[:, 3 * c :])
    hc = r_g * hc_ref[0].astype(jnp.float32) + i_g * c_g
    hc_out[0] = hc.astype(dtype)
    hid_out[0] = (o_g * jnp.tanh(hc)).astype(dtype)


@partial(jax.jit, static_argnames=("depth", "interpret"))
def cista_core_pallas(
    taps: dict,
    x1: jax.Array,
    z: jax.Array,
    cell: jax.Array,
    dg_hidden: jax.Array,
    dg_cell: jax.Array,
    depth: int = 5,
    interpret: bool = False,
):
    """Run the fused half-res core for one CISTA-LSTC step.

    Args:
      taps: ``core_taps(params)`` output.
      x1: heads output ``[B, H/2, W/2, C]`` (NHWC).
      z / cell: ConvLSTC state ``[B, H/2, W/2, 2C]``.
      dg_hidden / dg_cell: decoder ConvLSTM state ``[B, H/2, W/2, C]``.
    Returns ``(rec_h, z', cell', dg_hidden', dg_cell')`` — ``rec_h`` is the
    ConvLSTM hidden (== ``dg_hidden'``), ready for the upsample stage.
    """
    b, h, w, c = x1.shape
    hw = h * w
    dtype = x1.dtype

    def flat(a):
        return a.reshape(b, hw, a.shape[3])

    hp = hw + 2 * w + 2
    order = (
        "wg_x", "wg_z", "b_g", "w_p0", "b_p0", "wog_z0", "wog_z", "b_og",
        "w_d", "b_d", "w_p", "b_p", "lam", "w_dg", "b_dg", "wl_x", "wl_h",
        "b_l",
    )

    def wspec(name):
        a = taps[name]
        return pl.BlockSpec(
            a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
        )

    def iospec(ch):
        return pl.BlockSpec((1, hw, ch), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    kernel = partial(_core_kernel, depth, h, w, c, dtype)
    flops_conv = (
        12 * c * c + 8 * c * c + 2 * c * c  # lstc: gates, out_gates, P0
        + depth * 4 * c * c                 # ista D + P per iteration
        + 2 * c * c + 8 * c * c            # dg conv, lstm gates
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, hw, 2 * c), dtype),
            jax.ShapeDtypeStruct((b, hw, 2 * c), dtype),
            jax.ShapeDtypeStruct((b, hw, c), dtype),
            jax.ShapeDtypeStruct((b, hw, c), dtype),
        ),
        grid=(b,),
        in_specs=[iospec(c), iospec(2 * c), iospec(2 * c), iospec(c), iospec(c)]
        + [wspec(n) for n in order],
        out_specs=(iospec(2 * c), iospec(2 * c), iospec(c), iospec(c)),
        scratch_shapes=[
            pltpu.VMEM((hp, c), dtype),      # pad_a: x1 / ista xm / xg
            pltpu.VMEM((hp, 2 * c), dtype),  # pad_b: z / z_final
            pltpu.VMEM((hp, 2 * c), dtype),  # pad_c: z0 / ista z iterate
            pltpu.VMEM((hp, c), dtype),      # pad_d: lstm hidden
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * b * hw * flops_conv,
            bytes_accessed=b * hw * (c + 3 * 2 * c + 2 * c) * 2 * 2,
            transcendentals=b * hw * 10 * c,
        ),
    )(
        flat(x1), flat(z), flat(cell), flat(dg_hidden), flat(dg_cell),
        *[taps[n] for n in order],
    )
    z2, cell2, hid2, hc2 = outs

    def unflat(a):
        return a.reshape(b, h, w, a.shape[2])

    rec = unflat(hid2)
    return rec, unflat(z2), unflat(cell2), rec, unflat(hc2)
