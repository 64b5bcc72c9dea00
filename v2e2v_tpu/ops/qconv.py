"""Int8-quantized conv primitives for CISTA inference (TPU MXU int8 path).

Why: the CISTA step's half-res core convs are 64-out-channel 3x3s that
sustain 86-98 TFLOP/s bf16 on v5e (BENCH_NOTES.md stage ablation) — well
under the MXU's int8 rate (2x bf16). This module provides a
weights-per-output-channel / activations-dynamic-per-tensor symmetric int8
conv whose integer core is EXACT (int8 x int8 -> int32 accumulation), so
the only quantization error is the two rounding steps.

Scheme (standard symmetric post-training quantization):

- weights:      ``s_w[o] = max|w[..., o]| / 127``; ``w_q = round(w / s_w)``
                precomputed once per checkpoint (``quantize_conv_params``).
- activations:  ``s_x = max|x| / 127`` computed on the fly per conv input
                (one VPU reduction, fused by XLA into the producer);
                ``x_q = clip(round(x / s_x), -127, 127)``.
- conv:         ``lax.conv_general_dilated(x_q, w_q,
                preferred_element_type=int32)`` — exact integer math
                (|acc| <= 9 * 256 * 127^2 ~ 3.7e7 << 2^31).
- dequant:      ``y = acc * (s_x * s_w) + bias`` in f32, cast back to the
                activation dtype.

Reflect padding happens on the int8 tensor (pure copy, exact, 4x cheaper
than the f32 pad, and it fuses with the quantize producer). The strip-conv
fast path from ``ops/conv.py`` was MEASURED SLOWER here (BENCH_NOTES.md
round 4: static step 5.2 -> 5.9 ms/step at the flagship shape) — the int8
pad is cheap while the strip machinery adds ~15 extra small conv
custom-calls per step; ``_reflect1_conv3x3(preferred=jnp.int32)`` remains
available and bit-exact (tests/test_qconv.py) but is not used.

This is an INFERENCE path: no gradients are defined through the rounding.
Quality is validated at the metric level against the fp32/bf16 paths on
trained checkpoints (tests/test_qconv.py, scripts/bench_quant.py).

Reference parity note: the reference (lsying009/V2E2V) has no quantized
path; this is a net-new serving capability. It is opt-in via
``CistaConfig.quant='int8'`` and changes nothing by default.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]

_DN = ("NHWC", "HWIO", "NHWC")

# Calibration hook: when a list, quantize_activation appends each dynamic
# scale it computes (eager mode only; see calibrate_step_scales).
_CALIB: list | None = None


def quantize_conv_params(params: Params) -> Params:
    """Per-output-channel symmetric int8 quantization of a conv layer.

    ``{"weight": [k,k,in,out] f32, "bias"?: [out]}`` ->
    ``{"w_q": int8, "s_w": f32 [out], "bias"?: f32}``.
    """
    w = params["weight"].astype(jnp.float32)
    s_w = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
    s_w = jnp.where(s_w == 0, 1.0, s_w)
    w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    out: Params = {"w_q": w_q, "s_w": s_w}
    if "bias" in params:
        out["bias"] = params["bias"].astype(jnp.float32)
    return out


def quantize_activation(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Dynamic per-tensor symmetric int8: returns ``(x_q int8, s_x f32 scalar)``."""
    s_x = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0
    s_x = jnp.where(s_x == 0, 1.0, s_x)
    if _CALIB is not None:
        _CALIB.append(s_x)  # concrete in eager mode, traced under jit
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -127, 127).astype(jnp.int8)
    return x_q, s_x


def quantize_with(x: jax.Array, s_x: jax.Array) -> jax.Array:
    """Quantize with a given (static) scale: beyond-range saturates at +-127."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -127, 127).astype(jnp.int8)


def qconv2d_pre(
    x_q: jax.Array,
    s_x: jax.Array,
    qp: Params,
    padding: int = 1,
    stride: int = 1,
    pad_mode: str = "reflect",
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """``qconv2d`` on an ALREADY-quantized int8 input (requant-chain path).

    Used when the activation lives in int8 between convs (``s_x`` is its
    static scale): the caller quantized once at the producer, so neither a
    dynamic abs-max pass nor a fresh quantize happens here. HBM effect: the
    bf16 activation between the producer and this conv never materializes —
    only the s8 (padded) conv input does (HLO census, BENCH_NOTES.md).
    """
    if padding > 0:
        x_q = jnp.pad(
            x_q,
            ((0, 0), (padding, padding), (padding, padding), (0, 0)),
            mode=pad_mode if pad_mode != "zeros" else "constant",
        )
    acc = jax.lax.conv_general_dilated(
        x_q,
        qp["w_q"],
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (s_x * qp["s_w"])
    if "bias" in qp:
        y = y + qp["bias"]
    return y.astype(out_dtype)


def qconv2d(
    x: jax.Array,
    qp: Params,
    padding: int = 1,
    stride: int = 1,
    pad_mode: str = "reflect",
    out_dtype=None,
) -> jax.Array:
    """Quantized conv matching ``ops.conv.conv2d`` semantics (up to rounding).

    When ``qp`` carries a calibrated static scale ``s_x`` (see
    ``calibrate_step_scales``), the dynamic per-tensor abs-max reduction is
    skipped: the input is quantized with the stored scale (values beyond the
    calibrated range saturate at +-127, standard PTQ clipping).
    """
    s_x = qp.get("s_x")
    if s_x is None:
        x_q, s_x = quantize_activation(x)
    else:
        x_q = jnp.clip(
            jnp.round(x.astype(jnp.float32) / s_x), -127, 127
        ).astype(jnp.int8)
    if padding > 0:
        x_q = jnp.pad(
            x_q,
            ((0, 0), (padding, padding), (padding, padding), (0, 0)),
            mode=pad_mode if pad_mode != "zeros" else "constant",
        )
    acc = jax.lax.conv_general_dilated(
        x_q,
        qp["w_q"],
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (s_x * qp["s_w"])
    if "bias" in qp:
        y = y + qp["bias"]
    return y.astype(out_dtype if out_dtype is not None else x.dtype)


# ---------------------------------------------------------------------------
# quantized recurrent cells (mirror ops/conv.py semantics)
# ---------------------------------------------------------------------------

def qconv_lstc_step(
    qp: Params,
    x: jax.Array,
    z: jax.Array,
    prev_cell: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Int8 ``conv_lstc_step``: gates/P0/out_gates quantized, cell math float."""
    gates = qconv2d(jnp.concatenate([x, z], axis=-1), qp["gates"])
    in_g, forget_g = jnp.split(gates, 2, axis=-1)
    in_g = jax.nn.sigmoid(in_g)
    forget_g = jax.nn.sigmoid(forget_g)
    z0 = qconv2d(x, qp["P0"])
    out_g = jax.nn.sigmoid(qconv2d(jnp.concatenate([z0, z], axis=-1), qp["out_gates"]))
    cell = forget_g * prev_cell + in_g * z0
    return out_g * jnp.tanh(cell), cell


def qconv_lstm_step(
    qp: Params,
    x: jax.Array,
    state: tuple[jax.Array, jax.Array],
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """Int8 ``conv_lstm_step``: the 4-gate conv quantized, cell math float."""
    hidden, cell = state
    gates = qconv2d(jnp.concatenate([x, hidden], axis=-1), qp["Gates"])
    in_g, rem_g, out_g, cell_g = jnp.split(gates, 4, axis=-1)
    cell = jax.nn.sigmoid(rem_g) * cell + jax.nn.sigmoid(in_g) * jnp.tanh(cell_g)
    hidden = jax.nn.sigmoid(out_g) * jnp.tanh(cell)
    return hidden, (hidden, cell)


def quantize_cista_core(params: Params) -> Params:
    """Precompute int8 weights for the CISTA-LSTC half-res core.

    Covers the convs the stage ablation shows lane-bound at bf16: ConvLSTC
    (gates/P0/out_gates), the weight-tied ISTA pair (D/P), the decoder conv
    and the ConvLSTM gates. Heads and upsample/final stay float (they are
    cheap fused ops and the output conv dominates visual quality).
    """
    lstc = params["P0"]
    return {
        "lstc": {
            "gates": quantize_conv_params(lstc["gates"]),
            "P0": quantize_conv_params(lstc["P0"]),
            "out_gates": quantize_conv_params(lstc["out_gates"]),
        },
        "D": quantize_conv_params(params["lista"]["D"]),
        "P": quantize_conv_params(params["lista"]["P"]),
        "dg_conv": quantize_conv_params(params["Dg"]["conv"]),
        "lstm": {"Gates": quantize_conv_params(params["Dg"]["lstm"]["Gates"])},
    }


def quantize_core(params: Params, model_mode: str = "cista-lstc") -> Params:
    """Dispatch: precompute int8 weights for the given CISTA variant."""
    if model_mode == "cista-lstc":
        return quantize_cista_core(params)
    if model_mode == "cista-tc":
        return quantize_cista_tc_core(params)
    raise ValueError(f"unknown model_mode {model_mode!r}")


def quantize_cista_tc_core(params: Params) -> Params:
    """Precompute int8 weights for the CISTA-TC core.

    Same coverage policy as LSTC: the wide convs quantize (plain-conv ``P0``,
    weight-tied ISTA D/P, decoder conv, ConvLSTM gates); the 1-channel
    attention projections ``one_conv_for_prev/cur`` and the ``alpha`` gain
    stay float — they are a rounding-sensitive sigmoid gate and cost ~1% of
    the step's FLOPs.
    """
    return {
        "P0": quantize_conv_params(params["P0"]),
        "D": quantize_conv_params(params["lista"]["D"]),
        "P": quantize_conv_params(params["lista"]["P"]),
        "dg_conv": quantize_conv_params(params["Dg"]["conv"]),
        "lstm": {"Gates": quantize_conv_params(params["Dg"]["lstm"]["Gates"])},
    }


# ---------------------------------------------------------------------------
# static activation-scale calibration (optional PTQ refinement)
# ---------------------------------------------------------------------------
#
# The dynamic scheme above recomputes ``max|x|`` per conv input — ~15
# full-tensor VPU reductions per CISTA step. Calibrating static per-site
# scales offline removes those passes from the serving step. The conv-site
# call order inside the int8 steps is static (the ISTA depth loop is
# unrolled), so sites are identified positionally.

_SITE_ORDERS = {
    # models/cista.py cista_lstc_step_int8 / cista_tc_step_int8 call order
    "cista-lstc": lambda depth: (
        ["lstc.gates", "lstc.P0", "lstc.out_gates"]
        + ["D", "P"] * depth
        + ["dg_conv", "lstm.Gates"]
    ),
    "cista-tc": lambda depth: ["P0"] + ["D", "P"] * depth + ["dg_conv", "lstm.Gates"],
}


def calibrate_step_scales(
    run_steps,
    qp: Params,
    model_mode: str = "cista-lstc",
    depth: int = 5,
    margin: float = 1.0,
    use_jit: bool = True,
) -> Params:
    """Calibrate static activation scales by observing the dynamic ones.

    ``run_steps()`` must execute the int8 step function (``cista_*_step_int8``
    with ``qp`` as ``params['_quant']``) DIRECTLY — not under its own
    ``jax.jit`` — over representative calibration inputs, with a Python-level
    step loop (``lax.scan`` would hide the per-call scales). Returns a new
    quantized-params tree with ``s_x`` set per conv site to the running max
    over all observed calls (weight-tied sites like the ISTA D/P share one
    scale across the depth loop, taking the max). ``margin`` scales the
    calibrated range (>1.0 = extra headroom; beyond-range values saturate at
    +-127, standard PTQ clipping).

    With ``use_jit`` (default) the calibration run is traced ONCE as a
    zero-argument jit whose extra output is the stacked per-call scales —
    one compile (persistent-cacheable), then a single device execution.
    ``use_jit=False`` runs eagerly under ``jax.disable_jit()`` (slow on a
    tunneled TPU: ~100 dispatches per step).
    """
    global _CALIB
    if use_jit:
        def traced():
            global _CALIB
            _CALIB = []
            try:
                run_steps()
                return jnp.stack(_CALIB)
            finally:
                _CALIB = None

        scales = [float(s) for s in jax.jit(traced)()]
    else:
        _CALIB = []
        try:
            with jax.disable_jit():
                run_steps()
        finally:
            scales, _CALIB = _CALIB, None
        scales = [float(s) for s in scales]
    sites = _SITE_ORDERS[model_mode](depth)
    n = len(sites)
    if not scales or len(scales) % n != 0:
        raise ValueError(
            f"calibration recorded {len(scales)} scales, expected a multiple "
            f"of {n} ({model_mode}, depth={depth}) — run_steps must call the "
            "int8 step directly"
        )
    agg: dict[str, float] = {}
    for i, s in enumerate(scales):
        site = sites[i % n]
        agg[site] = max(agg.get(site, 0.0), s)

    out = jax.tree_util.tree_map(lambda x: x, qp)  # structural copy
    for site, s in agg.items():
        node = out
        *path, leaf = site.split(".")
        for p in path:
            node = node[p]
        node[leaf]["s_x"] = jnp.float32(max(s * margin, 1e-12))
    return out
