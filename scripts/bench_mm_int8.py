#!/usr/bin/env python
"""Probe: does XLA's int8 MATMUL hit the v5e 2x MXU rate (vs bf16) at the
CISTA core's implicit-GEMM shapes? If yes, conv->GEMM reformulation is a
real lever; if the matmul also lands ~1.2x, the int8 conv rate observed in
bench_qconv_micro.py IS the platform ceiling and ~3000 fps is near-optimal.

Usage: python scripts/bench_mm_int8.py [steps]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def timeit(fn, seq, w, steps, chain=4):
    @jax.jit
    def run(seq, w):
        def body(acc, xi):
            return acc + fn(xi, w).astype(jnp.float32).mean(), None
        acc, _ = jax.lax.scan(body, 0.0, seq)
        return acc

    float(run(seq, w))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = None
        for _ in range(chain):
            r = run(seq, w)
        float(r)
        best = min(best, (time.perf_counter() - t0) / chain)
    return best / steps * 1e3


def mm_i8(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)


def mm_bf16(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    key = jax.random.PRNGKey(0)
    # gates-conv implicit GEMM at b=8 (M = 8*90*120), the K=Cin slice
    # variant, and a big square control the MXU should saturate on.
    for M, K, N in [(86400, 1728, 256), (86400, 192, 256), (8192, 8192, 8192)]:
        gop = 2 * M * K * N / 1e9
        results = {}
        for kind in ("i8", "bf16"):
            if kind == "i8":
                seq = jax.random.randint(
                    key, (steps, M, K), -127, 128, jnp.int8)
                w = jax.random.randint(key, (K, N), -127, 128, jnp.int8)
                t = timeit(mm_i8, seq, w, steps)
            else:
                seq = jax.random.normal(key, (steps, M, K), jnp.bfloat16)
                w = jax.random.normal(key, (K, N), jnp.bfloat16) * 0.05
                t = timeit(mm_bf16, seq, w, steps)
            results[kind] = t
            del seq, w
        t_i8, t_bf = results["i8"], results["bf16"]
        print(f"M{M} K{K} N{N} {gop:7.1f} GOP | "
              f"i8 {t_i8:7.3f} ms ({gop / t_i8:6.1f} TOP/s) | "
              f"bf16 {t_bf:7.3f} ms ({gop / t_bf:6.1f} TF/s) | "
              f"ratio {t_bf / t_i8:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
