"""A/B the fused half-res core kernel (ops/pallas/core.py) vs XLA, one binary.

Measures (a) the isolated core (LSTC -> ISTA -> Dg -> LSTM) in both impls,
and (b) the full cista_sequence step with core_impl xla/pallas, chained-
execution timing with a scalar fetch (BENCH_NOTES measurement rules).

Usage: python scripts/bench_core_kernel.py [batch ...]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from v2e2v_tpu.models.cista import (  # noqa: E402
    CistaConfig,
    cista_sequence,
    init_cista_lstc,
)
from v2e2v_tpu.ops.pallas.core import cista_core_pallas, core_taps  # noqa: E402

H, W, C, DEPTH, NB, STEPS = 180, 240, 64, 5, 5, 32
DTYPE = jnp.bfloat16


def timeit(fn, *args, chain=6, best_of=3):
    r = fn(*args)
    jax.tree_util.tree_map(lambda x: float(x.sum().astype(jnp.float32)), r)
    best = float("inf")
    for _ in range(best_of):
        t0 = time.perf_counter()
        for _ in range(chain):
            r = fn(*args)
        jax.tree_util.tree_map(lambda x: float(x.sum().astype(jnp.float32)), r)
        best = min(best, (time.perf_counter() - t0) / chain)
    return best * 1e3


def bench_isolated(batch):
    cfg = CistaConfig(image_dim=(H, W), base_channels=C, depth=DEPTH, num_bins=NB)
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(DTYPE), params)
    taps = jax.jit(lambda p: core_taps(p, DTYPE))(params)

    h2, w2 = H // 2, W // 2
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    x1 = jax.random.normal(ks[0], (batch, h2, w2, C), DTYPE)
    z = 0.3 * jax.random.normal(ks[1], (batch, h2, w2, 2 * C), DTYPE)
    cell = 0.3 * jax.random.normal(ks[2], (batch, h2, w2, 2 * C), DTYPE)
    dh = 0.3 * jax.random.normal(ks[3], (batch, h2, w2, C), DTYPE)
    dc = 0.3 * jax.random.normal(ks[4], (batch, h2, w2, C), DTYPE)

    def xla_core(params, x1, z, cell, dh, dc):
        from v2e2v_tpu.ops.conv import conv_layer, conv_lstc_step, conv_lstm_step
        from v2e2v_tpu.ops.numerics import softshrink

        zn, cn = conv_lstc_step(params["P0"], x1, z, cell)
        zi = zn
        tmp = zi
        for _ in range(DEPTH):
            tmp = conv_layer(tmp, params["lista"]["D"], padding=1)
            x = conv_layer(x1 - tmp, params["lista"]["P"], padding=1) + zi
            zi = softshrink(x, params["lista"]["Lambda"])
            tmp = zi
        xg = conv_layer(zi, params["Dg"]["conv"], padding=1, activation="relu")
        rec, dg = conv_lstm_step(params["Dg"]["lstm"], xg, (dh, dc))
        return rec, zi, cn, dg[0], dg[1]

    t_x = timeit(jax.jit(xla_core), params, x1, z, cell, dh, dc)
    print(f"[b={batch}] isolated core XLA: {t_x:.3f} ms", flush=True)
    t0 = time.time()
    t_p = timeit(
        jax.jit(lambda *a: cista_core_pallas(*a, depth=DEPTH)),
        taps, x1, z, cell, dh, dc,
    )
    gf = 2 * 9 * batch * h2 * w2 * (34 * C * C + DEPTH * 4 * C * C) / 1e9
    print(
        f"[b={batch}] isolated core pallas: {t_p:.3f} ms "
        f"({gf / t_p:.0f} TFLOP/s vs XLA {gf / t_x:.0f}; "
        f"compile+warm {time.time() - t0:.0f}s)",
        flush=True,
    )


def bench_step(batch, core_impl):
    cfg = CistaConfig(
        image_dim=(H, W), base_channels=C, depth=DEPTH, num_bins=NB,
        core_impl=core_impl,
    )
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(DTYPE), params)

    @jax.jit
    def run(params, seq):
        recs, _ = cista_sequence(params, cfg, seq)
        return recs[-1].astype(jnp.float32).sum()

    seq = jax.random.normal(
        jax.random.PRNGKey(1), (STEPS, batch, H, W, NB), DTYPE
    )
    t0 = time.time()
    ms = timeit(run, params, seq)
    fps = batch * STEPS / (ms / 1e3)
    print(
        f"[b={batch}] full step {core_impl}: {ms / STEPS:.3f} ms/step "
        f"= {fps:.0f} fps (compile+bench {time.time() - t0:.0f}s)",
        flush=True,
    )


if __name__ == "__main__":
    batches = [int(a) for a in sys.argv[1:]] or [8, 16]
    for b in batches:
        bench_isolated(b)
    for b in batches:
        bench_step(b, "xla")
        bench_step(b, "pallas")
