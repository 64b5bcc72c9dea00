#!/usr/bin/env python
"""One-binary A/B/C at a given batch: where does parity IO win/lose?

A: full default path.
B: io_layout='parity' (packed events + packed feedback + packed outputs).
C: hybrid — packed events input (producer-side voxel layout), but FULL-RES
   feedback image and outputs: per-step s2d of the [B,H,W,1] image (cheap)
   feeds heads_parity_edgek; everything downstream identical to A.

Usage: python scripts/bench_parity_hybrid.py [batch] (default 16)
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
    cista_zero_state,
    init_cista_lstc,
)
from v2e2v_tpu.ops.conv import conv_layer, conv_lstc_step, conv_lstm_step
from v2e2v_tpu.ops.fused import (
    final_conv_parity_edgek,
    heads_parity_edgek,
    precompute_fused_kernels,
    space_to_depth,
    upsample_conv_parity_edgek,
)
from v2e2v_tpu.ops.numerics import softshrink

STEPS = 64


def hybrid_sequence(params, cfg, seqp):
    t, b = seqp.shape[0], seqp.shape[1]
    state = cista_zero_state(cfg, b, seqp.dtype)
    prev = jnp.zeros((b, cfg.image_dim[0], cfg.image_dim[1], 1), seqp.dtype)
    params = {**params, "_fullres_fused": precompute_fused_kernels(params)}
    kernels = params["_fullres_fused"]

    def step(params, ev_p, prev_img, st):
        x1 = heads_parity_edgek(
            params, ev_p, space_to_depth(prev_img), kernels=kernels
        )
        z, cell = conv_lstc_step(params["P0"], x1, st.z, st.cell)
        lista = params["lista"]
        lam = lista["Lambda"]
        tmp = z
        for _ in range(cfg.depth):
            tmp = conv_layer(tmp, lista["D"], padding=1)
            x = x1 - tmp
            x = conv_layer(x, lista["P"], padding=1)
            x = x + z
            z = softshrink(x, lam)
            tmp = z
        x = conv_layer(z, params["Dg"]["conv"], padding=1, activation="relu")
        rec, dg_state = conv_lstm_step(params["Dg"]["lstm"], x, st.dg)
        rec = upsample_conv_parity_edgek(
            params["upsamp_conv"], rec, activation="relu", kernels=kernels
        )
        rec = final_conv_parity_edgek(params["final_conv"], rec, kernels=kernels)
        from v2e2v_tpu.models.cista import CistaState

        return jax.nn.sigmoid(rec), CistaState(cell=cell, z=z, dg=dg_state)

    def body(carry, ev):
        prev_img, st = carry
        rec, st = step(params, ev, prev_img, st)
        return (rec, st), rec

    (_, fs), recs = jax.lax.scan(body, (prev, state), seqp)
    return recs, fs


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
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    dtype = jnp.bfloat16
    cfg = CistaConfig(image_dim=(180, 240))
    cfgp = CistaConfig(image_dim=(180, 240), io_layout="parity")
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)

    seq = jax.random.normal(jax.random.PRNGKey(1), (STEPS, b, 180, 240, 5), dtype)
    seqp = jax.jit(
        lambda s: space_to_depth(s.reshape(STEPS * b, 180, 240, 5)).reshape(
            STEPS, b, 90, 120, 20
        )
    )(seq)
    seqp.block_until_ready()

    @jax.jit
    def run_a(params, seq):
        recs, _ = cista_sequence(params, cfg, seq)
        return recs.astype(jnp.float32).sum()

    @jax.jit
    def run_b(params, seqp):
        recs, _ = cista_sequence(params, cfgp, seqp, input_packed=True)
        return recs.astype(jnp.float32).sum()

    @jax.jit
    def run_c(params, seqp):
        recs, _ = hybrid_sequence(params, cfg, seqp)
        return recs.astype(jnp.float32).sum()

    # correctness cross-check first
    va = float(run_a(params, seq))
    vb = float(run_b(params, seqp))
    vc = float(run_c(params, seqp))
    print(f"sums A={va:.1f} B={vb:.1f} C={vc:.1f}", flush=True)

    for name, run, args in (
        ("A full       ", run_a, (params, seq)),
        ("B parity     ", run_b, (params, seqp)),
        ("C hybrid-in  ", run_c, (params, seqp)),
    ):
        t = bench(run, args)
        print(
            f"{name} {t*1e3/STEPS:7.3f} ms/step {b*STEPS/t:7.1f} fps",
            flush=True,
        )


if __name__ == "__main__":
    main()
