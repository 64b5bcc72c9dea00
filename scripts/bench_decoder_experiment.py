#!/usr/bin/env python
"""A/B experiments for the full-resolution stages of the CISTA step.

Stage bench (b=16 bf16) shows heads 0.57 ms, up 0.84 ms, final 0.32 ms
against BW/MXU floors of ~0.05/0.15/0.12 ms — this script isolates where
those go: materialized ``jnp.pad`` copies, border-fixup strips/wheres, or
the interior convs themselves.

Variants (each timed standalone in a 64-step lax.scan like the stage bench):
  up_cur      current upsample_conv_parity (pad + conv + strips + wheres)
  up_conv     interior parity conv ONLY (native conv padding, no fixups)
  up_nopad    current minus the materialized pad (conv pads natively)
  fin_cur     current final_conv_parity (_reflect_pad_parity + conv + d2s)
  fin_conv    SAME-padded block conv + d2s ONLY (borders wrong)
  tail_cur    up_cur -> fin_cur (the real composite)
  tail_fused  Pallas fused decoder tail (if ops.pallas.decoder_tail exists)

Usage: python scripts/bench_decoder_experiment.py [batch] [dtype]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from v2e2v_tpu.models.cista import CistaConfig, init_cista_lstc
from v2e2v_tpu.ops.fused import (
    _conv,
    _final_parity_kernel,
    _reflect_pad_parity,
    _upsample_parity_kernel,
    depth_to_space,
    final_conv_parity,
    upsample_conv_parity,
)

_DN = ("NHWC", "HWIO", "NHWC")


def conv_same(x, w, b=None):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=_DN, preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y if b is None else y + b.astype(x.dtype)


def build_variants(params):
    ku, bu = _upsample_parity_kernel(params["upsamp_conv"])
    kf, bf = _final_parity_kernel(params["final_conv"])

    def up_cur(h):
        return upsample_conv_parity(params["upsamp_conv"], h, activation="relu",
                                    kernels={"upsamp": (ku, bu)})

    def up_conv(h):
        return jax.nn.relu(conv_same(h, ku, bu))

    def fin_cur(y):
        return final_conv_parity(params["final_conv"], y,
                                 kernels={"final": (kf, bf)})

    def fin_conv(y):
        return depth_to_space(conv_same(y, kf, bf))

    def tail_cur(h):
        return fin_cur(up_cur(h))

    from v2e2v_tpu.ops.fused import (
        _final_border_kernels,
        _up_border_kernels,
        final_conv_parity_edgek,
        upsample_conv_parity_edgek,
    )

    ek = {
        "upsamp": (ku, bu),
        "upsamp_borders": _up_border_kernels(params["upsamp_conv"]),
        "final": (kf, bf),
        "final_borders": _final_border_kernels(params["final_conv"], parity=(kf, bf)),
    }

    def up_edgek(h):
        return upsample_conv_parity_edgek(
            params["upsamp_conv"], h, activation="relu", kernels=ek
        )

    def tail_edgek(h):
        return final_conv_parity_edgek(params["final_conv"], up_edgek(h), kernels=ek)

    variants = {
        "up_cur": up_cur,
        "up_conv": up_conv,
        "up_edgek": up_edgek,
        "fin_cur": lambda h: fin_cur(up_conv(h)),
        "fin_conv": lambda h: fin_conv(up_conv(h)),
        "tail_cur": tail_cur,
        "tail_edgek": tail_edgek,
    }
    try:
        from v2e2v_tpu.ops.pallas.decoder_tail import decoder_tail_fused

        variants["tail_fused"] = lambda h: decoder_tail_fused(
            params["upsamp_conv"], params["final_conv"], h,
            kernels={"upsamp": (ku, bu), "final": (kf, bf)},
        )
    except ImportError:
        pass
    return variants


def time_op(fn, h, steps=64, chain=4):
    @jax.jit
    def run(seq):
        def body(acc, x):
            return acc + fn(x).astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, 0.0, seq)
        return acc

    seq = jnp.broadcast_to(h, (steps, *h.shape))
    float(run(seq))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = None
        for _ in range(chain):
            r = run(seq)
        float(r)
        best = min(best, (time.perf_counter() - t0) / chain)
    return best / steps * 1e3


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    dtype = jnp.bfloat16 if (len(sys.argv) < 3 or sys.argv[2] == "bf16") else jnp.float32
    cfg = CistaConfig(image_dim=(180, 240), base_channels=64, depth=5, num_bins=5)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(dtype), init_cista_lstc(jax.random.PRNGKey(0), cfg)
    )
    h = jax.random.normal(jax.random.PRNGKey(1), (batch, 90, 120, 64), dtype)

    # numeric check of the fused tail (if present) vs the current path
    variants = build_variants(params)
    if "tail_fused" in variants:
        a = variants["tail_cur"](h).astype(jnp.float32)
        b = variants["tail_fused"](h).astype(jnp.float32)
        err = float(jnp.abs(a - b).max())
        print(f"tail_fused max|diff| vs tail_cur: {err:.3e}", flush=True)

    for name, fn in variants.items():
        ms = time_op(fn, h)
        print(f"{name:>11}: {ms:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
