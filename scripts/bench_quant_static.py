#!/usr/bin/env python
"""A/B: dynamic vs calibrated-static activation scales for the int8 step.

The dynamic int8 path recomputes ``max|x|`` per conv input (~15 full-tensor
VPU reductions per CISTA step). ``calibrate_step_scales`` (ops/qconv.py)
replaces them with static per-site scales. This measures what that buys at
the flagship serving shape.

Usage: python scripts/bench_quant_static.py [batch] [steps]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from v2e2v_tpu.models.cista import (
    CistaConfig,
    cista_lstc_step_int8,
    cista_zero_state,
    init_cista_lstc,
)
from v2e2v_tpu.ops.fused import precompute_fused_kernels
from v2e2v_tpu.ops.qconv import calibrate_step_scales, quantize_cista_core


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    dtype = jnp.bfloat16
    cfg = CistaConfig(image_dim=(180, 240), quant="int8")
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    qp = quantize_cista_core(params)
    params["_fullres_fused"] = precompute_fused_kernels(params)

    seq = jax.random.normal(
        jax.random.PRNGKey(1), (steps, batch, 180, 240, 5), dtype
    )
    prev = jnp.zeros((batch, 180, 240, 1), dtype)
    state0 = cista_zero_state(cfg, batch, dtype)

    # calibrate on 2 eager steps at batch 2 (per-tensor max; the small batch
    # sees the same distribution)
    calib_seq = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 180, 240, 5), dtype)
    calib_prev = jnp.zeros((2, 180, 240, 1), dtype)
    calib_state = cista_zero_state(cfg, 2, dtype)
    params_dyn = dict(params)
    params_dyn["_quant"] = qp

    def run_calib():
        s = calib_state
        for t in range(calib_seq.shape[0]):
            _, s = cista_lstc_step_int8(params_dyn, cfg, calib_seq[t], calib_prev, s)

    t0 = time.perf_counter()
    qp_static = calibrate_step_scales(run_calib, qp, depth=cfg.depth, margin=1.1)
    print(f"calibration (2 eager steps): {time.perf_counter() - t0:.1f}s", flush=True)

    def make_run(p):
        def run(pp, seq, prev, state):
            def body(carry, ev):
                s, acc = carry
                out, s = cista_lstc_step_int8(pp, cfg, ev, prev, s)
                return (s, acc + out.astype(jnp.float32).sum()), None

            (state, acc), _ = jax.lax.scan(body, (state, 0.0), seq)
            return acc

        return jax.jit(run), p

    results = {}
    for name, q in (("dynamic", qp), ("static", qp_static)):
        p = dict(params)
        p["_quant"] = q
        run, p = make_run(p)
        float(run(p, seq, prev, state0))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = None
            for _ in range(4):
                r = run(p, seq, prev, state0)
            float(r)
            best = min(best, (time.perf_counter() - t0) / 4)
        fps = batch * steps / best
        results[name] = fps
        print(f"{name:>8}: {best / steps * 1e3:7.3f} ms/step  fps={fps:7.1f}", flush=True)

    print(f"static/dynamic: {results['static'] / results['dynamic']:.3f}x")


if __name__ == "__main__":
    main()
