#!/usr/bin/env python
"""Microbenchmark: how fast is ONE int8 conv at the CISTA core shapes, and
how much of the int8 step's glue (quantize/dequant chains) rides along?

The round-4 stage ablation puts the int8 core at 4.54 ms/step = ~213 TOP/s
(~54% of the v5e int8 peak) while the bf16 core ran at ~84% of bf16 peak.
This isolates where the int8 headroom goes per conv site:

  i8_raw    conv(x_q s8, w_q s8, preferred=s32)      — the bare MXU op
  i8_chain  bf16 -> quantize(static s_x) -> conv -> dequant -> bf16
            (the exact per-site chain of qconv2d with calibrated scales)
  bf16      plain bf16 conv, preferred f32            — the 1x-rate baseline

at the three core contractions (gates 192->256, D 128->64, P 64->128),
b=16 @ 90x120, zero-pad SAME (the pad-mode delta is measured elsewhere).

Usage: python scripts/bench_qconv_micro.py [batch] [steps]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

_DN = ("NHWC", "HWIO", "NHWC")


def timeit(fn, x_seq, w, steps, chain=4):
    """Scan over per-step-varying xs (loop-invariant inputs get hoisted and
    report fantasy numbers — see bench_conv_micro.py)."""

    @jax.jit
    def run(seq, w):
        def body(acc, xi):
            return acc + fn(xi, w).astype(jnp.float32).mean(), None
        acc, _ = jax.lax.scan(body, 0.0, seq)
        return acc

    float(run(x_seq, w))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = None
        for _ in range(chain):
            r = run(x_seq, w)
        float(r)
        best = min(best, (time.perf_counter() - t0) / chain)
    return best / steps * 1e3


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    key = jax.random.PRNGKey(0)
    shapes = [("gates 192->256", 192, 256), ("D 128->64", 128, 64),
              ("P 64->128", 64, 128)]
    print(f"b={b} @90x120, {steps}-step scan; v5e peaks ~197 TF/s bf16 "
          f"/ ~394 TOP/s int8")
    for name, cin, cout in shapes:
        gflop = 2 * 9 * cin * cout * 90 * 120 * b / 1e9
        x = jax.random.normal(key, (steps, b, 90, 120, cin), jnp.bfloat16)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 40.0), -127, 127
                      ).astype(jnp.int8)
        w = (jax.random.normal(key, (3, 3, cin, cout), jnp.float32) * 0.05)
        wq = jnp.clip(jnp.round(w / 0.001), -127, 127).astype(jnp.int8)
        s_w = jnp.full((cout,), 0.001, jnp.float32)

        def conv_i8(xi, wq):
            return jax.lax.conv_general_dilated(
                xi, wq, (1, 1), "SAME", dimension_numbers=_DN,
                preferred_element_type=jnp.int32)

        def chain_i8(xi, wq, s_x=jnp.float32(1 / 40.0), s_w=s_w):
            q = jnp.clip(jnp.round(xi.astype(jnp.float32) / s_x), -127, 127
                         ).astype(jnp.int8)
            acc = jax.lax.conv_general_dilated(
                q, wq, (1, 1), "SAME", dimension_numbers=_DN,
                preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * (s_x * s_w)).astype(jnp.bfloat16)

        def conv_bf16(xi, wf):
            return jax.lax.conv_general_dilated(
                xi, wf, (1, 1), "SAME", dimension_numbers=_DN,
                preferred_element_type=jnp.float32)

        t_raw = timeit(conv_i8, xq, wq, steps)
        t_chain = timeit(chain_i8, x, wq, steps)
        t_bf16 = timeit(conv_bf16, x, w.astype(jnp.bfloat16), steps)
        print(f"{name:16s} {gflop:6.1f} GOP | "
              f"i8_raw {t_raw:7.3f} ms ({gflop / t_raw:6.1f} TOP/s) | "
              f"i8_chain {t_chain:7.3f} ms ({gflop / t_chain:6.1f}) | "
              f"bf16 {t_bf16:7.3f} ms ({gflop / t_bf16:6.1f} TF/s)")


if __name__ == "__main__":
    main()
