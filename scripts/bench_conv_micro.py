#!/usr/bin/env python
"""Microbenchmark: what does one 3x3 conv at the CISTA core shape cost,
and how far is it from the MXU ceiling for the same contraction?

Variants (64-step scan, b=16 bf16, 90x120 half-res):
  conv64      lax.conv [3,3,64,64] SAME            (the ISTA/LSTC unit op)
  conv256     lax.conv [3,3,64,256] SAME           (the parity-up unit op)
  mm576x64    [B*90*120, 576] @ [576, 64]          (implicit-GEMM equivalent)
  mm576x256   [B*90*120, 576] @ [576, 256]
  convL64     conv64 with im2col done manually (9 shifted adds via matmul)

Usage: python scripts/bench_conv_micro.py [batch] [dtype]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

_DN = ("NHWC", "HWIO", "NHWC")


def timeit(fn, *args, steps=16, chain=4):
    """Times fn(x, w) over a scan whose xs VARY per step (a fresh random
    [steps, ...] stack) — with a loop-invariant input XLA hoists the op out
    of the loop and reports fantasy numbers (measured: conv256 "397 TF/s")."""
    x, w = args
    seq = jax.random.normal(jax.random.PRNGKey(7), (steps, *x.shape), x.dtype)

    @jax.jit
    def run(seq, w):
        def body(acc, xi):
            return acc + fn(xi, w).astype(jnp.float32).mean(), None
        acc, _ = jax.lax.scan(body, 0.0, seq)
        return acc

    args = (seq, w)
    float(run(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = None
        for _ in range(chain):
            r = run(*args)
        float(r)
        best = min(best, (time.perf_counter() - t0) / chain)
    return best / steps * 1e3


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    dtype = jnp.bfloat16 if (len(sys.argv) < 3 or sys.argv[2] == "bf16") else jnp.float32
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, 90, 120, 64), dtype)
    w64 = jax.random.normal(key, (3, 3, 64, 64), dtype) * 0.1
    w256 = jax.random.normal(key, (3, 3, 64, 256), dtype) * 0.1
    a = jax.random.normal(key, (b * 90 * 120, 576), dtype)
    m64 = jax.random.normal(key, (576, 64), dtype) * 0.1
    m256 = jax.random.normal(key, (576, 256), dtype) * 0.1

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=_DN,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)

    def mm(a, m):
        return jax.lax.dot(a, m, preferred_element_type=jnp.float32).astype(a.dtype)

    gf64 = b * 90 * 120 * 9 * 64 * 64 * 2 / 1e9
    gf256 = gf64 * 4
    for name, fn, args, gf in (
        ("conv64", conv, (x, w64), gf64),
        ("conv256", conv, (x, w256), gf256),
        ("mm576x64", mm, (a, m64), gf64),
        ("mm576x256", mm, (a, m256), gf256),
    ):
        ms = timeit(fn, *args)
        print(f"{name:>10}: {ms:7.3f} ms  ({gf / ms:6.1f} TFLOP/s)", flush=True)


if __name__ == "__main__":
    main()
