#!/usr/bin/env python
"""One-binary matrix bench of CistaConfig impl choices on the full step.

Measures the headline computation (64-step cista_sequence scan) for each
(lstc_impl, ista_impl) combination in ONE process so XLA autotuning noise
can't fake differences between runs.

Usage: python scripts/bench_impl_matrix.py [batch] [dtype]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from v2e2v_tpu.models.cista import CistaConfig, cista_sequence, init_cista_lstc


def bench(cfg, params, seq, chain=4):
    @jax.jit
    def run(params, seq):
        recs, _ = cista_sequence(params, cfg, seq)
        return recs[-1].astype(jnp.float32).sum()

    float(run(params, seq))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = None
        for _ in range(chain):
            r = run(params, seq)
        float(r)
        best = min(best, (time.perf_counter() - t0) / chain)
    steps, batch = seq.shape[0], seq.shape[1]
    return batch * steps / best


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dtype = jnp.bfloat16 if (len(sys.argv) < 3 or sys.argv[2] == "bf16") else jnp.float32
    base = CistaConfig(image_dim=(180, 240), base_channels=64, depth=5, num_bins=5)
    params = init_cista_lstc(jax.random.PRNGKey(0), base)
    params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    seq = jax.random.normal(jax.random.PRNGKey(1), (64, batch, 180, 240, 5), dtype)

    for lstc in ("ref", "fused"):
        for ista in ("xla", "pallas"):
            cfg = base._replace(lstc_impl=lstc, ista_impl=ista) if hasattr(
                base, "_replace"
            ) else CistaConfig(
                image_dim=(180, 240), base_channels=64, depth=5, num_bins=5,
                lstc_impl=lstc, ista_impl=ista,
            )
            try:
                fps = bench(cfg, params, seq)
                print(f"lstc={lstc:<5} ista={ista:<6}: {fps:7.1f} fps", flush=True)
            except Exception as e:  # Mosaic compile failures shouldn't kill the matrix
                print(f"lstc={lstc:<5} ista={ista:<6}: FAILED {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
