#!/usr/bin/env python
"""One-binary A/B: does the edgek heads rewrite slow the downstream ConvLSTC?

Cross-run stage-bench deltas are polluted by XLA autotuning; this compares
heads_fused (strips) vs heads_fused_edgek feeding the same LSTC cell inside
one compiled program each, same process.

Usage: python scripts/bench_heads_lstc_ab.py [batch] [lstc_impl]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from v2e2v_tpu.models.cista import CistaConfig, cista_zero_state, init_cista_lstc
from v2e2v_tpu.ops.fused import (
    heads_fused,
    heads_fused_edgek,
    precompute_fused_kernels,
)
from v2e2v_tpu.ops.conv import conv_lstc_fuse, conv_lstc_step, conv_lstc_step_fused


def time_variant(heads_fn, lstc_impl, params, cfg, batch, dtype, steps=64, chain=4):
    @jax.jit
    def run(params, seq, state):
        kernels = precompute_fused_kernels(params)
        fused_lstc = conv_lstc_fuse(params["P0"]) if lstc_impl == "fused" else None

        def body(carry, ev):
            s, acc = carry
            x1 = heads_fn(params, ev, jnp.zeros_like(ev[..., :1]), kernels=kernels)
            if lstc_impl == "fused":
                z, cell = conv_lstc_step_fused(fused_lstc, x1, s.z, s.cell)
            else:
                z, cell = conv_lstc_step(params["P0"], x1, s.z, s.cell)
            return (s._replace(cell=cell), acc + z.astype(jnp.float32).sum()), None

        (state, acc), _ = jax.lax.scan(body, (state, 0.0), seq)
        return acc

    p = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    seq = jax.random.normal(
        jax.random.PRNGKey(1), (steps, batch, *cfg.image_dim, cfg.num_bins), dtype
    )
    st = cista_zero_state(cfg, batch, dtype)
    float(run(p, seq, st))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = None
        for _ in range(chain):
            r = run(p, seq, st)
        float(r)
        best = min(best, (time.perf_counter() - t0) / chain)
    return best / steps * 1e3


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    lstc_impl = sys.argv[2] if len(sys.argv) > 2 else "fused"
    dtype = jnp.bfloat16
    cfg = CistaConfig(image_dim=(180, 240), base_channels=64, depth=5, num_bins=5)
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    for name, fn in (("strips", heads_fused), ("edgek", heads_fused_edgek)):
        ms = time_variant(fn, lstc_impl, params, cfg, batch, dtype)
        print(f"heads_{name} -> lstc[{lstc_impl}]: {ms:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
