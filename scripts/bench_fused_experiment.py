#!/usr/bin/env python
"""Interior-only perf experiment for full-res conv fusion (TPU).

Validates the speedup of three candidate rewrites before exact border
stitching is implemented (borders are WRONG here — perf probe only):

  A. heads: We|Wi merged + composed with stride-2 W0 -> one 5x5/s2 conv
  B. upsample+conv: bilinear2x + reflect conv3x3 -> parity conv 3x3 at
     half res producing 4C channels (space-to-depth domain)
  C. final conv: full-res 3x3 64->1 -> parity conv 3x3 (4*64 -> 4) + d2s

Usage: python scripts/bench_fused_experiment.py [batch]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from v2e2v_tpu.models.cista import CistaConfig, init_cista_lstc
from v2e2v_tpu.ops.conv import conv_layer, upsample_conv_layer

H, W, C, NB = 180, 240, 64, 5
DN = ("NHWC", "HWIO", "NHWC")


def timed(fn, *args, chain=8, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = None
        for _ in range(chain):
            r = fn(*args)
        jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))), r)
        best = min(best, (time.perf_counter() - t0) / chain)
    return best * 1e3


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dtype = jnp.bfloat16
    cfg = CistaConfig(image_dim=(H, W), base_channels=C, depth=5, num_bins=NB)
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)

    ev = jax.random.normal(jax.random.PRNGKey(1), (batch, H, W, NB), dtype)
    pi = jax.random.normal(jax.random.PRNGKey(2), (batch, H, W, 1), dtype)
    hh = jax.random.normal(jax.random.PRNGKey(3), (batch, H // 2, W // 2, C), dtype)
    full = jax.random.normal(jax.random.PRNGKey(4), (batch, H, W, C), dtype)

    # ---- A. heads ----------------------------------------------------------
    @jax.jit
    def heads_ref(params, ev, pi):
        x_e = conv_layer(ev, params["We"], padding=1)
        x_i = conv_layer(pi, params["Wi"], padding=1)
        x1 = jnp.concatenate([x_e, x_i], axis=-1)
        return conv_layer(x1, params["W0"], stride=2, padding=1)

    # composed 5x5 stride-2 kernel (interior math only)
    def compose(params):
        we, wi, w0 = params["We"]["weight"], params["Wi"]["weight"], params["W0"]["weight"]
        a = jnp.zeros((3, 3, NB + 1, C), dtype).at[:, :, :NB, : C // 2].set(we)
        a = a.at[:, :, NB:, C // 2 :].set(wi)
        k5 = jnp.zeros((5, 5, NB + 1, C), jnp.float32)
        for r1 in range(3):
            for r2 in range(3):
                k5 = k5.at[r1 : r1 + 3, r2 : r2 + 3].add(
                    jnp.einsum(
                        "abim,mo->abio", a.astype(jnp.float32),
                        w0[r1, r2].astype(jnp.float32),
                    )
                )
        b_a = jnp.concatenate([params["We"]["bias"], params["Wi"]["bias"]]).astype(jnp.float32)
        b5 = jnp.einsum("abmo,m->o", w0.astype(jnp.float32), b_a) + params["W0"][
            "bias"
        ].astype(jnp.float32)
        return k5.astype(dtype), b5.astype(dtype)

    k5, b5 = compose(params)

    @jax.jit
    def heads_fused(k5, b5, ev, pi):
        x = jnp.concatenate([ev, pi], axis=-1)
        x = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))  # borders WRONG (probe)
        y = jax.lax.conv_general_dilated(
            x, k5, (2, 2), "VALID", dimension_numbers=DN,
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        return y + b5

    t_ref = timed(heads_ref, params, ev, pi)
    t_fused = timed(heads_fused, k5, b5, ev, pi)
    print(f"A heads : ref {t_ref:6.3f} ms  fused {t_fused:6.3f} ms "
          f"({t_ref/t_fused:.2f}x)", flush=True)

    # ---- B. upsample+conv --------------------------------------------------
    @jax.jit
    def upsamp_ref(params, hh):
        return upsample_conv_layer(
            hh, params["upsamp_conv"], activation="relu", out_hw=(H, W)
        )

    # parity kernels: y[2k+p, 2l+q] = sum_d Kpq[d] h[k+d, l+d2]
    def parity_kernels(wf, bias):
        # bilinear taps: parity0 -> (d=-1: .25, d=0: .75); parity1 -> (0: .75, 1: .25)
        taps = {0: {-1: 0.25, 0: 0.75}, 1: {0: 0.75, 1: 0.25}}
        ks = []
        wf = wf.astype(jnp.float32)
        for p in (0, 1):
            for q in (0, 1):
                k = jnp.zeros((3, 3, C, C), jnp.float32)
                for r1 in range(-1, 2):
                    for r2 in range(-1, 2):
                        m1, pr1 = divmod(p + r1, 2)
                        m2, pr2 = divmod(q + r2, 2)
                        for d1, c1 in taps[pr1].items():
                            for d2, c2 in taps[pr2].items():
                                k = k.at[m1 + d1 + 1, m2 + d2 + 1].add(
                                    c1 * c2 * wf[r1 + 1, r2 + 1]
                                )
                ks.append(k)
        kk = jnp.stack(ks, -2)  # [3,3,4,C,C] -> reshape to [3,3,C,4C]
        kk = jnp.transpose(kk, (0, 1, 3, 2, 4)).reshape(3, 3, C, 4 * C)
        bb = jnp.tile(bias.astype(jnp.float32), 4)
        return kk.astype(dtype), bb.astype(dtype)

    kp, bp = parity_kernels(
        params["upsamp_conv"]["weight"], params["upsamp_conv"]["bias"]
    )

    @jax.jit
    def upsamp_fused(kp, bp, hh):
        x = jnp.pad(hh, ((0, 0), (1, 1), (1, 1), (0, 0)))  # borders WRONG
        y = jax.lax.conv_general_dilated(
            x, kp, (1, 1), "VALID", dimension_numbers=DN,
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        return jax.nn.relu(y + bp)

    t_ref = timed(upsamp_ref, params, hh)
    t_fused = timed(upsamp_fused, kp, bp, hh)
    print(f"B upsamp: ref {t_ref:6.3f} ms  fused {t_fused:6.3f} ms "
          f"({t_ref/t_fused:.2f}x)", flush=True)

    # ---- C. final conv ------------------------------------------------------
    @jax.jit
    def final_ref(params, full):
        y = conv_layer(full, params["final_conv"], padding=1)
        return jax.nn.sigmoid(y)

    def final_parity_kernel(wf, bias):
        wf = wf.astype(jnp.float32)  # [3,3,C,1]
        ks = []
        for p in (0, 1):
            for q in (0, 1):
                k = jnp.zeros((3, 3, 4 * C, 1), jnp.float32)
                for r1 in range(-1, 2):
                    for r2 in range(-1, 2):
                        m1, pr1 = divmod(p + r1, 2)
                        m2, pr2 = divmod(q + r2, 2)
                        pc = pr1 * 2 + pr2
                        k = k.at[m1 + 1, m2 + 1, pc * C : (pc + 1) * C].add(
                            wf[r1 + 1, r2 + 1]
                        )
                ks.append(k)
        kk = jnp.concatenate(ks, -1)  # [3,3,4C,4]
        return kk.astype(dtype), jnp.tile(bias.astype(jnp.float32), 4).astype(dtype)

    kf, bf = final_parity_kernel(
        params["final_conv"]["weight"], params["final_conv"]["bias"]
    )
    par = jax.random.normal(
        jax.random.PRNGKey(5), (batch, H // 2, W // 2, 4 * C), dtype
    )

    @jax.jit
    def final_fused(kf, bf, par):
        x = jnp.pad(par, ((0, 0), (1, 1), (1, 1), (0, 0)))  # borders WRONG
        y = jax.lax.conv_general_dilated(
            x, kf, (1, 1), "VALID", dimension_numbers=DN,
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        y = jax.nn.sigmoid(y + bf)
        # d2s: [B, Hh, Wh, 4] -> [B, H, W, 1]
        b_, hh_, ww_, _ = y.shape
        y = y.reshape(b_, hh_, ww_, 2, 2).transpose(0, 1, 3, 2, 4)
        return y.reshape(b_, 2 * hh_, 2 * ww_, 1)

    t_ref = timed(final_ref, params, full)
    t_fused = timed(final_fused, kf, bf, par)
    print(f"C final : ref {t_ref:6.3f} ms  fused {t_fused:6.3f} ms "
          f"({t_ref/t_fused:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
