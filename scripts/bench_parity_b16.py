#!/usr/bin/env python
"""One-binary A/B: io_layout full vs parity at several batch sizes.

All variants measured in ONE process (XLA autotuning noise can't fake
cross-variant differences). Parity input is PRE-PACKED — legitimate because
the voxelizer can emit the parity layout natively (pure index arithmetic in
the scatter, see ops/voxel.py), so serving never pays the s2d. Outputs are
consumed with a full-precision sum over ALL steps so nothing is DCE'd.

Usage: python scripts/bench_parity_b16.py [batches...] (default 8 16 20)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from v2e2v_tpu.models.cista import CistaConfig, cista_sequence, init_cista_lstc
from v2e2v_tpu.ops.fused import space_to_depth

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
    batches = [int(a) for a in sys.argv[1:]] or [8, 16, 20]
    dtype = jnp.bfloat16
    cfg = CistaConfig(image_dim=(180, 240))
    cfgp = CistaConfig(image_dim=(180, 240), io_layout="parity")
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)

    for b in batches:
        seq = jax.random.normal(
            jax.random.PRNGKey(1), (STEPS, b, 180, 240, 5), dtype
        )
        # pre-packed parity input (producer-side layout, zero-cost at source)
        seqp = jax.jit(
            lambda s: space_to_depth(s.reshape(STEPS * b, 180, 240, 5)).reshape(
                STEPS, b, 90, 120, 20
            )
        )(seq)
        seqp.block_until_ready()

        @jax.jit
        def run_full(params, seq):
            recs, _ = cista_sequence(params, cfg, seq)
            return recs.astype(jnp.float32).sum()

        @jax.jit
        def run_parity(params, seq):
            recs, _ = cista_sequence(params, cfgp, seq, input_packed=True)
            return recs.astype(jnp.float32).sum()

        tf = bench(run_full, (params, seq))
        tp = bench(run_parity, (params, seqp))
        print(
            f"b={b:3d}  full {tf*1e3/STEPS:7.3f} ms/step {b*STEPS/tf:7.1f} fps"
            f" | parity {tp*1e3/STEPS:7.3f} ms/step {b*STEPS/tp:7.1f} fps"
            f" ({(tf/tp-1)*100:+.1f}%)",
            flush=True,
        )


if __name__ == "__main__":
    main()
