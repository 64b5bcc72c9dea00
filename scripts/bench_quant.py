#!/usr/bin/env python
"""A/B the int8 CISTA core (CistaConfig.quant) against the float path.

Two questions, one binary:
1. SPEED — does XLA lower the int8 convs to the MXU's int8 rate (2x bf16)?
   Measures ms/step and fps for float vs int8 at the headline config
   (180x240, bf16 activations, batch sweep).
2. QUALITY — on a TRAINED checkpoint (pass --ckpt), per-step mean |delta|
   vs the float path over a synthetic sequence, plus MSE/PSNR/SSIM of both
   paths against each other. (Full metric parity on real eval data goes
   through test_e2v.py; this is the fast gate.)

Usage: python scripts/bench_quant.py [--ckpt DIR] [batches...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from v2e2v_tpu.models.cista import (
    CistaConfig,
    cista_sequence,
    init_cista_lstc,
)

STEPS = 64


def bench(run, args, chain=4):
    float(run(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = None
        for _ in range(chain):
            r = run(*args)
        float(r)
        best = min(best, (time.perf_counter() - t0) / chain)
    return best


def main():
    argv = sys.argv[1:]
    ckpt = None
    if "--ckpt" in argv:
        i = argv.index("--ckpt")
        ckpt = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    static = "--static" in argv
    if static:
        argv.remove("--static")
    batches = [int(a) for a in argv] or [8, 16]

    dtype = jnp.bfloat16
    cfg = CistaConfig(image_dim=(180, 240))
    cfg_q = CistaConfig(image_dim=(180, 240), quant="int8")
    if ckpt is not None:
        from v2e2v_tpu.utils.checkpoint import load_checkpoint

        loaded = load_checkpoint(ckpt)
        params = loaded["params"]
        print(f"[quant] loaded checkpoint {ckpt}", file=sys.stderr)
    else:
        params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)

    params_q = params
    if static:
        # calibrate static activation scales on 2 steps of the bench
        # distribution (traced once; ops/qconv.py calibrate_step_scales)
        import time as _t

        from v2e2v_tpu.models.cista import cista_lstc_step_int8, cista_zero_state
        from v2e2v_tpu.ops.fused import precompute_fused_kernels
        from v2e2v_tpu.ops.qconv import calibrate_step_scales, quantize_core

        qp = quantize_core(params)
        p_cal = {**params, "_quant": qp,
                 "_fullres_fused": precompute_fused_kernels(params)}
        cseq = 0.5 * jax.random.normal(
            jax.random.PRNGKey(7), (2, 2, 180, 240, 5), dtype
        )
        cprev = jnp.zeros((2, 180, 240, 1), dtype)
        cstate = cista_zero_state(cfg, 2, dtype)

        def run_calib():
            s = cstate
            for t in range(cseq.shape[0]):
                _, s = cista_lstc_step_int8(p_cal, cfg_q, cseq[t], cprev, s)

        t0 = _t.perf_counter()
        qp_static = calibrate_step_scales(run_calib, qp, depth=cfg.depth, margin=1.1)
        print(f"[quant] static calibration: {_t.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        params_q = {**params, "_quant": qp_static}

    for b in batches:
        seq = 0.5 * jax.random.normal(
            jax.random.PRNGKey(1), (STEPS, b, 180, 240, 5), dtype
        )

        @jax.jit
        def run_float(params, seq):
            recs, _ = cista_sequence(params, cfg, seq)
            return recs.astype(jnp.float32).sum()

        @jax.jit
        def run_int8(params, seq):
            recs, _ = cista_sequence(params, cfg_q, seq)
            return recs.astype(jnp.float32).sum()

        tf = bench(run_float, (params, seq))
        tq = bench(run_int8, (params_q, seq))
        print(
            f"b={b:3d}  float {tf*1e3/STEPS:7.3f} ms/step {b*STEPS/tf:7.1f} fps"
            f" | int8 {tq*1e3/STEPS:7.3f} ms/step {b*STEPS/tq:7.1f} fps"
            f" ({(tf/tq-1)*100:+.1f}%)",
            flush=True,
        )

    # quality gate at b=1 on a longer sequence
    b = 1
    seq = 0.5 * jax.random.normal(jax.random.PRNGKey(2), (128, b, 180, 240, 5), dtype)

    from functools import partial

    @partial(jax.jit, static_argnums=0)
    def recs_of(cfg_, params, seq):
        recs, _ = cista_sequence(params, cfg_, seq)
        return recs.astype(jnp.float32)

    rf = recs_of(cfg, params, seq)
    rq = recs_of(cfg_q, params_q, seq)
    d = jnp.abs(rq - rf)
    mse = jnp.mean((rq - rf) ** 2)
    psnr = -10 * jnp.log10(mse + 1e-12)
    print(
        f"quality (128-step seq, b=1): mean|d| {float(d.mean()):.5f}  "
        f"max|d| {float(d.max()):.4f}  last-step mean|d| "
        f"{float(d[-1].mean()):.5f}  PSNR(int8 vs float) {float(psnr):.2f} dB",
        flush=True,
    )


if __name__ == "__main__":
    main()
