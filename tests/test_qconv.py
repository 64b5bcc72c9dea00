"""Int8 quantized inference path (ops/qconv.py, CistaConfig.quant).

Three layers of evidence:
1. the integer core is EXACT — qconv2d's int8 x int8 -> int32 conv matches
   a numpy integer oracle bit-for-bit;
2. quantization fidelity — qconv2d tracks the float conv within the error
   budget implied by 8-bit rounding on random weights/activations;
3. the quantized CISTA-LSTC step/sequence stays close to the float path
   (relative error small, no drift blowup over a short recurrence).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2e2v_tpu.models.cista import (
    CistaConfig,
    cista_sequence,
    cista_zero_state,
    init_cista_lstc,
)
from v2e2v_tpu.ops.conv import conv2d, conv_init
from v2e2v_tpu.ops.qconv import (
    qconv2d,
    quantize_activation,
    quantize_conv_params,
)


def test_qconv_integer_core_exact_vs_numpy():
    """The int8 conv accumulates EXACTLY like integer numpy."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 12, 14, 6), jnp.float32)
    p = conv_init(jax.random.fold_in(key, 1), 6, 8, 3)
    qp = quantize_conv_params(p)

    x_q, s_x = quantize_activation(x)
    xp = np.pad(
        np.asarray(x_q, np.int32),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
        mode="reflect",
    )
    w = np.asarray(qp["w_q"], np.int32)
    b, h, wdt, cin = x.shape
    cout = w.shape[3]
    ref = np.zeros((b, h, wdt, cout), np.int64)
    for dy in range(3):
        for dx in range(3):
            ref += np.einsum(
                "bhwc,co->bhwo",
                xp[:, dy : dy + h, dx : dx + wdt, :],
                w[dy, dx],
                dtype=np.int64,
            )
    got = qconv2d(x, qp)
    expect = ref.astype(np.float32) * (
        float(s_x) * np.asarray(qp["s_w"], np.float32)
    ) + np.asarray(qp["bias"], np.float32)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-6, atol=1e-6)


def test_qconv_fidelity_vs_float():
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 24, 32, 64), jnp.float32)
    p = conv_init(jax.random.fold_in(key, 1), 64, 64, 3)
    y_f = conv2d(x, p, padding=1)
    y_q = qconv2d(x, quantize_conv_params(p))
    # 8-bit symmetric on gaussian data: relative L2 error well under 2%
    err = float(jnp.linalg.norm(y_q - y_f) / jnp.linalg.norm(y_f))
    assert err < 0.02, err


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_quant_sequence_tracks_float(dtype):
    """int8 CISTA-LSTC over a short recurrence stays near the float path."""
    cfg = CistaConfig(image_dim=(32, 40), base_channels=16, depth=2, num_bins=5)
    cfg_q = CistaConfig(
        image_dim=(32, 40), base_channels=16, depth=2, num_bins=5, quant="int8"
    )
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    seq = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (3, 2, 32, 40, 5), dtype)
    params_c = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
    state = cista_zero_state(cfg, 2, dtype)

    recs_f, _ = jax.jit(lambda p, s: cista_sequence(p, cfg, s, state=state))(
        params_c, seq
    )
    recs_q, _ = jax.jit(lambda p, s: cista_sequence(p, cfg_q, s, state=state))(
        params_c, seq
    )
    recs_f = np.asarray(recs_f, np.float32)
    recs_q = np.asarray(recs_q, np.float32)
    # sigmoid outputs in [0,1]; require small mean deviation INCLUDING the
    # last step (no compounding blowup through the recurrence)
    assert np.mean(np.abs(recs_q - recs_f)) < 0.03
    assert np.mean(np.abs(recs_q[-1] - recs_f[-1])) < 0.05


def test_quant_sequence_tracks_float_cista_tc():
    """int8 CISTA-TC (plain P0, ISTA pair, decoder, ConvLSTM quantized;
    attention projections float) tracks the float path."""
    from v2e2v_tpu.models.cista import init_cista_tc

    kw = dict(image_dim=(32, 40), base_channels=16, depth=2, num_bins=5,
              model_mode="cista-tc")
    cfg = CistaConfig(**kw)
    cfg_q = CistaConfig(**kw, quant="int8")
    params = init_cista_tc(jax.random.PRNGKey(0), cfg)
    seq = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (3, 2, 32, 40, 5))

    recs_f, _ = jax.jit(lambda p, s: cista_sequence(p, cfg, s))(params, seq)
    recs_q, _ = jax.jit(lambda p, s: cista_sequence(p, cfg_q, s))(params, seq)
    recs_f = np.asarray(recs_f, np.float32)
    recs_q = np.asarray(recs_q, np.float32)
    assert np.mean(np.abs(recs_q - recs_f)) < 0.03
    assert np.mean(np.abs(recs_q[-1] - recs_f[-1])) < 0.05


def test_static_scale_calibration_tracks_dynamic():
    """Calibrated static activation scales (qconv.py calibrate_step_scales)
    reproduce the dynamic-scale int8 path closely on the data distribution
    they were calibrated on, every conv site receives a scale, and the
    eager calibration mode observes the SAME scales as the traced
    (one-compile) mode."""
    from v2e2v_tpu.models.cista import cista_lstc_step_int8
    from v2e2v_tpu.ops.qconv import calibrate_step_scales, quantize_cista_core

    cfg = CistaConfig(
        image_dim=(32, 40), base_channels=16, depth=2, num_bins=5, quant="int8"
    )
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    seq = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (3, 2, 32, 40, 5))
    prev = jnp.zeros((2, 32, 40, 1), jnp.float32)
    state0 = cista_zero_state(cfg, 2)

    qp = quantize_cista_core(params)
    params_dyn = {**params, "_quant": qp}

    def run_steps():
        s = state0
        for t in range(seq.shape[0]):
            _, s = cista_lstc_step_int8(params_dyn, cfg, seq[t], prev, s)

    qp_static = calibrate_step_scales(run_steps, qp, depth=cfg.depth, use_jit=True)
    for site in ("D", "P", "dg_conv"):
        assert "s_x" in qp_static[site], site
    for site in ("gates", "P0", "out_gates"):
        assert "s_x" in qp_static["lstc"][site], site
    assert "s_x" in qp_static["lstm"]["Gates"]
    assert "s_x" not in qp["D"]  # calibration must not mutate its input

    # the eager (use_jit=False) mode must observe identical scales — a
    # direct equivalence check, replacing a second full parametrized run.
    # One step only: the eager leg dispatches op-by-op (uncacheable), and
    # one step exercises every site the traced interceptor sees.
    def run_one():
        cista_lstc_step_int8(params_dyn, cfg, seq[0], prev, state0)

    qp_tr1 = calibrate_step_scales(run_one, qp, depth=cfg.depth, use_jit=True)
    qp_eg1 = calibrate_step_scales(run_one, qp, depth=cfg.depth, use_jit=False)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=1e-6
        ),
        qp_tr1, qp_eg1,
    )

    params_sta = {**params, "_quant": qp_static}

    def run(p):
        def body(s, ev):
            out, s = cista_lstc_step_int8(p, cfg, ev, prev, s)
            return s, out

        _, recs = jax.lax.scan(body, state0, seq)
        return recs

    recs_dyn = np.asarray(jax.jit(run)(params_dyn), np.float32)
    recs_sta = np.asarray(jax.jit(run)(params_sta), np.float32)
    # same distribution as calibration -> scales only differ by per-step
    # max jitter; outputs should agree tightly (sigmoid range [0,1])
    assert np.mean(np.abs(recs_sta - recs_dyn)) < 0.01
    assert np.max(np.abs(recs_sta - recs_dyn)) < 0.2


def test_static_scale_calibration_cista_tc():
    """The TC site order in qconv._SITE_ORDERS matches cista_tc_step_int8's
    actual conv call sequence, and the calibrated path tracks dynamic."""
    from v2e2v_tpu.models.cista import cista_tc_step_int8, init_cista_tc
    from v2e2v_tpu.ops.qconv import calibrate_step_scales, quantize_cista_tc_core

    cfg = CistaConfig(
        image_dim=(32, 40), base_channels=16, depth=2, num_bins=5,
        model_mode="cista-tc", quant="int8",
    )
    params = init_cista_tc(jax.random.PRNGKey(0), cfg)
    seq = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (3, 2, 32, 40, 5))
    prev = jnp.zeros((2, 32, 40, 1), jnp.float32)
    state0 = cista_zero_state(cfg, 2)

    qp = quantize_cista_tc_core(params)
    params_dyn = {**params, "_quant": qp}

    def run_steps():
        s = state0
        for t in range(seq.shape[0]):
            _, s = cista_tc_step_int8(params_dyn, cfg, seq[t], prev, s)

    qp_static = calibrate_step_scales(
        run_steps, qp, model_mode="cista-tc", depth=cfg.depth
    )
    for site in ("P0", "D", "P", "dg_conv"):
        assert "s_x" in qp_static[site], site
    assert "s_x" in qp_static["lstm"]["Gates"]

    params_sta = {**params, "_quant": qp_static}

    def run(p):
        def body(s, ev):
            out, s = cista_tc_step_int8(p, cfg, ev, prev, s)
            return s, out

        _, recs = jax.lax.scan(body, state0, seq)
        return recs

    recs_dyn = np.asarray(jax.jit(run)(params_dyn), np.float32)
    recs_sta = np.asarray(jax.jit(run)(params_sta), np.float32)
    assert np.mean(np.abs(recs_sta - recs_dyn)) < 0.01


def test_qconv_strip_fast_path_integer_exact():
    """The pad-copy-free reflect conv (int32 accumulation) is BIT-EXACT vs
    the explicit reflect-pad int8 conv — the strip algebra is pure conv
    linearity, no rounding. The int8 path does NOT route through it (it
    measured slower there — BENCH_NOTES.md round 4: the int8 pad copy is
    cheap and fuses with the quantize, while the strips add ~15 small conv
    custom-calls per step); this pins the ``preferred=jnp.int32`` algebra
    so the option stays sound."""
    import jax.lax as lax

    from v2e2v_tpu.ops.conv import _reflect1_conv3x3

    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, (2, 20, 24, 8), jnp.float32)
    p = conv_init(jax.random.fold_in(key, 1), 8, 16, 3)
    qp = quantize_conv_params(p)
    x_q, _ = quantize_activation(x)

    acc_fast = _reflect1_conv3x3(x_q, qp["w_q"], preferred=jnp.int32)
    x_pad = jnp.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    acc_ref = lax.conv_general_dilated(
        x_pad, qp["w_q"], window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    assert acc_fast.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(acc_fast), np.asarray(acc_ref))


def test_requant_chain_tracks_static_and_falls_back():
    """``CistaConfig.requant_chain`` (int8 activation storage through the
    ISTA loop — the residual reads the dequantized z_q, models/cista.py)
    tracks the plain static path closely, and without static scales the
    flag is inert (bit-identical to the dynamic path)."""
    import dataclasses

    from v2e2v_tpu.models.cista import cista_lstc_step_int8
    from v2e2v_tpu.ops.qconv import calibrate_step_scales, quantize_cista_core

    cfg = CistaConfig(
        image_dim=(32, 40), base_channels=16, depth=2, num_bins=5, quant="int8"
    )
    cfg_chain = dataclasses.replace(cfg, requant_chain=True)
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    ev = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (2, 32, 40, 5))
    prev = jnp.zeros((2, 32, 40, 1), jnp.float32)
    state0 = cista_zero_state(cfg, 2)

    qp = quantize_cista_core(params)
    p_dyn = {**params, "_quant": qp}

    def run_steps():
        s = state0
        for _ in range(2):
            _, s = cista_lstc_step_int8(p_dyn, cfg, ev, prev, s)

    qp_static = calibrate_step_scales(run_steps, qp, depth=cfg.depth, margin=1.1)
    p_sta = {**params, "_quant": qp_static}

    r_sta, s_sta = jax.jit(
        lambda p: cista_lstc_step_int8(p, cfg, ev, prev, state0)
    )(p_sta)
    r_chn, s_chn = jax.jit(
        lambda p: cista_lstc_step_int8(p, cfg_chain, ev, prev, state0)
    )(p_sta)
    # the chain's only numerical change is the residual reading the
    # dequantized z_q (same rounding the D conv already sees)
    assert float(jnp.max(jnp.abs(r_sta - r_chn))) < 0.02
    assert float(jnp.max(jnp.abs(s_sta.dg[0] - s_chn.dg[0]))) < 0.05

    # without static scales the chain flag must be inert (exact fallback)
    r_dyn, _ = jax.jit(lambda p: cista_lstc_step_int8(p, cfg, ev, prev, state0))(p_dyn)
    r_fb, _ = jax.jit(
        lambda p: cista_lstc_step_int8(p, cfg_chain, ev, prev, state0)
    )(p_dyn)
    np.testing.assert_array_equal(np.asarray(r_dyn), np.asarray(r_fb))


def test_int8_static_drift_check_catches_distribution_shift():
    """``int8_static_drift_check`` (VERDICT r4 #5): static scales far below
    the pack's activation range clip every site at +-127 — exactly what a
    checkpoint/distribution mismatch produces — and the check must flag it,
    while the properly calibrated scales pass the budget.

    (Scaling the *input* down during calibration is NOT a usable shift
    injection here: the deeper sites' activations are sigmoid/tanh- and
    bias-dominated, so their calibrated scales barely move — measured
    delta 7e-5. The mechanism under test is the float-vs-int8 comparison,
    so the shift is injected where it physically lands: the scales. The
    decoder tail is amplified so the random-init reconstruction has real
    structure — the raw init outputs a near-constant sigmoid(~0) image on
    which SSIM is blind by construction.)"""
    from v2e2v_tpu.models.cista import (
        cista_lstc_step_int8,
        int8_static_drift_check,
    )
    from v2e2v_tpu.ops.qconv import calibrate_step_scales, quantize_cista_core

    cfg = CistaConfig(
        image_dim=(32, 40), base_channels=16, depth=2, num_bins=5, quant="int8"
    )
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    for name, f in (("upsamp_conv", 4.0), ("final_conv", 50.0)):
        params[name] = {
            k: v * f if k == "weight" else v for k, v in params[name].items()
        }
    ev = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 40, 5))
    prev = jnp.zeros((1, 32, 40, 1), jnp.float32)
    state0 = cista_zero_state(cfg, 1)
    qp = quantize_cista_core(params)

    p_dyn = {**params, "_quant": qp}

    def run_steps():
        cista_lstc_step_int8(p_dyn, cfg, ev, prev, state0)

    qp_static = calibrate_step_scales(run_steps, qp, depth=cfg.depth, margin=1.1)

    # calibrated on the real distribution: passes the budget
    p_good = {**params, "_quant": qp_static}
    delta, ok = int8_static_drift_check(p_good, cfg, ev, prev, state0)
    assert ok, f"in-distribution delta {delta}"

    # scales 100x below the observed range (the signature of calibrating on
    # a different checkpoint/distribution): every site saturates at +-127 ->
    # structural damage the check must flag
    def shrink_scales(node):
        return {
            k: (v * 1e-2 if k == "s_x" else shrink_scales(v) if isinstance(v, dict) else v)
            for k, v in node.items()
        }

    p_bad = {**params, "_quant": shrink_scales(qp_static)}
    delta_bad, ok_bad = int8_static_drift_check(p_bad, cfg, ev, prev, state0)
    assert not ok_bad, f"shifted delta {delta_bad} unexpectedly under budget"
    assert delta_bad > delta
