#!/usr/bin/env python
"""A/B: static int8 scales vs static + requant-chain ISTA loop.

The requant chain (``_quant['requant_chain']``, models/cista.py
cista_lstc_step_int8) stores the ISTA code z as int8 between iterations:
the residual ``x + z`` reads the dequantized ``z_q * s_z`` so the bf16 z
(2 bytes/elem x depth stores/step, ~44 MB each at flagship b=16) never
materializes — the quantize fuses into the softshrink producer. The HLO
census (BENCH_NOTES.md round 4) bounds the upside at ~10-15%% of the step.

Usage: python scripts/bench_quant_chain.py [batch] [steps]
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
    print(f"calibration: {time.perf_counter() - t0:.1f}s", flush=True)
    import dataclasses

    cfg_chain = dataclasses.replace(cfg, requant_chain=True)

    def make_run(p, c):
        def run(pp, seq, prev, state):
            def body(carry, ev):
                s, acc = carry
                out, s = cista_lstc_step_int8(pp, c, ev, prev, s)
                return (s, acc + out.astype(jnp.float32).sum()), None

            (state, acc), _ = jax.lax.scan(body, (state, 0.0), seq)
            return acc

        return jax.jit(run), p

    results = {}
    for name, c in (("static", cfg), ("chain", cfg_chain)):
        p = dict(params)
        p["_quant"] = qp_static
        run, p = make_run(p, c)
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

    print(f"chain/static: {results['chain'] / results['static']:.3f}x")


if __name__ == "__main__":
    main()
