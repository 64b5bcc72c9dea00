#!/usr/bin/env python
"""Stage-level ablation of the CISTA-LSTC step on the real TPU.

Times the full step and truncated variants (heads-only, +LSTC, +ISTA,
+decoder LSTM, +upsample/final) at the headline config to locate where the
per-frame milliseconds go. Each variant returns a scalar so the tunnel's
lazy dispatch is forced (block_until_ready does not block here).

Usage: python scripts/bench_e2v_stages.py [batch] [dtype] [fullres_impl]
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
from v2e2v_tpu.ops.conv import (
    conv_layer,
    conv_lstc_fuse,
    conv_lstc_step,
    conv_lstc_step_fused,
    conv_lstm_step,
)
from v2e2v_tpu.ops.numerics import softshrink


def build(cfg, stage: str):
    def step(params, events, prev_image, state):
        x1 = _heads(params, cfg, events, prev_image)
        if stage == "heads":
            return x1.astype(jnp.float32).sum(), state

        if cfg.lstc_impl == "fused":
            z, cell = conv_lstc_step_fused(
                params.get("_lstc_fused") or conv_lstc_fuse(params["P0"]),
                x1, state.z, state.cell,
            )
        else:
            z, cell = conv_lstc_step(params["P0"], x1, state.z, state.cell)
        if stage == "lstc":
            return z.astype(jnp.float32).sum(), state._replace(cell=cell)

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
        if stage == "ista":
            return z.astype(jnp.float32).sum(), state._replace(cell=cell, z=z)

        x = conv_layer(z, params["Dg"]["conv"], padding=1, activation="relu")
        rec, dg_state = conv_lstm_step(params["Dg"]["lstm"], x, state.dg)
        if stage == "dg":
            return rec.astype(jnp.float32).sum(), state._replace(
                cell=cell, z=z, dg=dg_state
            )

        if stage == "up":  # upsample WITHOUT the final C->1 conv
            from v2e2v_tpu.ops.fused import upsample_conv_parity_edgek as upsample_conv_parity

            up = upsample_conv_parity(
                params["upsamp_conv"], rec, activation="relu",
                kernels=params.get("_fullres_fused"),
            )
            return up.astype(jnp.float32).sum(), state._replace(
                cell=cell, z=z, dg=dg_state
            )

        rec = _upsample_final(params, cfg, rec, upsamp_activation="relu")
        rec = jax.nn.sigmoid(rec)
        return rec.astype(jnp.float32).sum(), state._replace(
            cell=cell, z=z, dg=dg_state
        )

    return step


def time_stage(cfg, params, batch, dtype, stage, steps=64, chain=4):
    step = build(cfg, stage)

    @jax.jit
    def run(params, seq, state):
        if cfg.lstc_impl == "fused":
            params = {**params, "_lstc_fused": conv_lstc_fuse(params["P0"])}
        if cfg.fullres_impl == "fused":
            from v2e2v_tpu.ops.fused import precompute_fused_kernels

            params = {**params, "_fullres_fused": precompute_fused_kernels(params)}

        def body(carry, ev):
            s, acc = carry
            val, s = step(params, ev, jnp.zeros_like(seq[0, :, :, :, :1]), s)
            return (s, acc + val), None

        (state, acc), _ = jax.lax.scan(body, (state, 0.0), seq)
        return acc

    p = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    seq = jax.random.normal(
        jax.random.PRNGKey(1), (steps, batch, *cfg.image_dim, cfg.num_bins), dtype
    )
    st = cista_zero_state(cfg, batch, dtype)
    float(run(p, seq, st))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = None
        for _ in range(chain):
            r = run(p, seq, st)
        float(r)
        best = min(best, (time.perf_counter() - t0) / chain)
    return best / steps * 1e3  # ms per step


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dtype = jnp.bfloat16 if (len(sys.argv) < 3 or sys.argv[2] == "bf16") else jnp.float32
    fullres = sys.argv[3] if len(sys.argv) > 3 else "fused"
    lstc = sys.argv[4] if len(sys.argv) > 4 else "fused"
    cfg = CistaConfig(
        image_dim=(180, 240), base_channels=64, depth=5, num_bins=5,
        fullres_impl=fullres, lstc_impl=lstc,
    )
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)

    prev = 0.0
    for stage in ("heads", "lstc", "ista", "dg", "up", "full"):
        ms = time_stage(cfg, params, batch, dtype, stage)
        print(
            f"{stage:>7}: {ms:7.3f} ms/step (+{ms - prev:6.3f})  "
            f"[{batch / ms * 1e3:7.0f} fps]",
            flush=True,
        )
        prev = ms


if __name__ == "__main__":
    main()
