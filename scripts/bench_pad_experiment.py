#!/usr/bin/env python
"""Bound the cost of reflect-pad ops in the CISTA step (TPU experiment).

Reflect padding lowers to concat-of-reversed-slices (a real HBM copy per
conv input), while zero padding folds into the conv's HLO padding config
(no copy). This script times the step with every half-res conv switched to
in-conv zero padding — numerically WRONG at the 1-pixel border, but
identical FLOPs/shapes — to measure the achievable upside of a
border-corrected reflect rewrite before building one.

Usage: python scripts/bench_pad_experiment.py [batch] [dtype]
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
from v2e2v_tpu.ops import conv as conv_mod
from v2e2v_tpu.ops.conv import conv_layer, conv_lstc_step, conv_lstm_step
from v2e2v_tpu.ops.numerics import softshrink

_DN = ("NHWC", "HWIO", "NHWC")


def conv_same(x, params, stride=1):
    w = params["weight"]
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=((1, 1), (1, 1)), dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    )
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y.astype(x.dtype)


def build_step(cfg, pad_impl: str):
    """pad_impl: 'reflect' (current) or 'zero_inconv' (approximate)."""

    if pad_impl == "reflect":
        c3 = lambda x, p, act=None: conv_layer(x, p, padding=1, activation=act)
    else:
        def c3(x, p, act=None):
            y = conv_same(x, p)
            return y if act is None else getattr(jax.nn, act)(y)

    def lstc(params, x, z, prev_cell):
        if pad_impl == "reflect":
            return conv_lstc_step(params, x, z, prev_cell)
        gates = conv_same(jnp.concatenate([x, z], axis=-1), params["gates"])
        in_g, forget_g = jnp.split(gates, 2, axis=-1)
        z0 = conv_same(x, params["P0"])
        out_g = jax.nn.sigmoid(
            conv_same(jnp.concatenate([z0, z], axis=-1), params["out_gates"])
        )
        cell = jax.nn.sigmoid(forget_g) * prev_cell + jax.nn.sigmoid(in_g) * z0
        return out_g * jnp.tanh(cell), cell

    def lstm(params, x, state):
        if pad_impl == "reflect":
            return conv_lstm_step(params, x, state)
        hidden, cell = state
        gates = conv_same(jnp.concatenate([x, hidden], axis=-1), params["Gates"])
        in_g, rem_g, out_g, cell_g = jnp.split(gates, 4, axis=-1)
        cell = jax.nn.sigmoid(rem_g) * cell + jax.nn.sigmoid(in_g) * jnp.tanh(cell_g)
        hidden = jax.nn.sigmoid(out_g) * jnp.tanh(cell)
        return hidden, (hidden, cell)

    def step(params, events, prev_image, state):
        x1 = _heads(params, cfg, events, prev_image)
        z, cell = lstc(params["P0"], x1, state.z, state.cell)
        lista = params["lista"]
        lam = lista["Lambda"]
        tmp = z
        for _ in range(cfg.depth):
            tmp = c3(tmp, lista["D"])
            x = c3(x1 - tmp, lista["P"])
            z = softshrink(x + z, lam)
            tmp = z
        x = c3(z, params["Dg"]["conv"], "relu")
        rec, dg_state = lstm(params["Dg"]["lstm"], x, state.dg)
        rec = _upsample_final(params, cfg, rec, upsamp_activation="relu")
        rec = jax.nn.sigmoid(rec)
        return rec.astype(jnp.float32).sum(), state._replace(
            cell=cell, z=z, dg=dg_state
        )

    return step


def time_impl(cfg, params, batch, dtype, pad_impl, steps=64, chain=4):
    step = build_step(cfg, pad_impl)

    @jax.jit
    def run(params, seq, state):
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
    return best / steps * 1e3


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dtype = jnp.bfloat16 if (len(sys.argv) < 3 or sys.argv[2] == "bf16") else jnp.float32
    cfg = CistaConfig(image_dim=(180, 240))
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    for impl in ("reflect", "zero_inconv"):
        ms = time_impl(cfg, params, batch, dtype, impl)
        print(f"{impl:>12}: {ms:7.3f} ms/step  [{batch / ms * 1e3:7.0f} fps]", flush=True)


if __name__ == "__main__":
    main()
