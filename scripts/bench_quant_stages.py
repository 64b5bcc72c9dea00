#!/usr/bin/env python
"""Stage ablation of the INT8 CISTA-LSTC step on the real TPU.

The int8 core (ops/qconv.py) took the headline to ~2605 fps at b=16; the
remaining float stages are the fused heads and the parity-domain
upsample/final (ops/fused.py). This measures how much of the int8 step those
float full-res stages still cost — the go/no-go number for an int8 variant
of the fused full-res path.

Stages (cumulative, mirrors scripts/bench_e2v_stages.py but on the int8 step):
  heads      — fused 5x5/s2 edgek heads (float)
  +core      — int8 ConvLSTC + ISTA x5 + Dg conv + ConvLSTM
  +tail      — float parity-domain upsample + final conv + sigmoid (full step)

Usage: python scripts/bench_quant_stages.py [batch] [steps]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from v2e2v_tpu.models.cista import (
    CistaConfig,
    _heads,
    _upsample_final,
    cista_zero_state,
    init_cista_lstc,
)
from v2e2v_tpu.ops.fused import precompute_fused_kernels
from v2e2v_tpu.ops.numerics import softshrink
from v2e2v_tpu.ops.qconv import (
    qconv2d,
    qconv_lstc_step,
    qconv_lstm_step,
    quantize_cista_core,
)


def build(cfg, stage: str):
    def step(params, events, prev_image, state):
        qp = params["_quant"]
        x1 = _heads(params, cfg, events, prev_image)
        if stage == "heads":
            return x1.astype(jnp.float32).sum(), state
        z, cell = qconv_lstc_step(qp["lstc"], x1, state.z, state.cell)
        lam = params["lista"]["Lambda"]
        tmp = z
        for _ in range(cfg.depth):
            tmp = qconv2d(tmp, qp["D"])
            x = x1 - tmp
            x = qconv2d(x, qp["P"])
            x = x + z
            z = softshrink(x, lam)
            tmp = z
        x = jax.nn.relu(qconv2d(z, qp["dg_conv"]))
        rec, dg_state = qconv_lstm_step(qp["lstm"], x, state.dg)
        if stage == "core":
            return rec.astype(jnp.float32).sum(), state
        rec = _upsample_final(params, cfg, rec, upsamp_activation="relu")
        return jax.nn.sigmoid(rec).astype(jnp.float32).sum(), state

    def run(params, seq, prev, state):
        def body(carry, ev):
            s, acc = carry
            out, s = step(params, ev, prev, s)
            return (s, acc + out), None

        (state, acc), _ = jax.lax.scan(body, (state, 0.0), seq)
        return acc

    return jax.jit(run)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    dtype = jnp.bfloat16
    cfg = CistaConfig(image_dim=(180, 240))
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    params["_quant"] = quantize_cista_core(params)
    params["_fullres_fused"] = precompute_fused_kernels(params)

    seq = jax.random.normal(
        jax.random.PRNGKey(1), (steps, batch, 180, 240, 5), dtype
    )
    prev = jnp.zeros((batch, 180, 240, 1), dtype)
    state = cista_zero_state(cfg, batch, dtype)

    last = 0.0
    for stage in ("heads", "core", "full"):
        run = build(cfg, stage)
        float(run(params, seq, prev, state))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = None
            for _ in range(4):
                r = run(params, seq, prev, state)
            float(r)
            best = min(best, (time.perf_counter() - t0) / 4)
        ms = best / steps * 1e3
        print(
            f"{stage:>6}: {ms:7.3f} ms/step  (delta {ms - last:6.3f})  "
            f"fps={batch * steps / best:7.1f}",
            flush=True,
        )
        last = ms


if __name__ == "__main__":
    main()
