#!/usr/bin/env python
"""Measure the Super-SloMo upsampling stage (VERDICT r4 #7).

The ``upsampling`` reader runs ``Upsampler.upsampling`` ONCE per sequence at
init (reference ``upsampling/utils/upsamp_sequence.py:87-133``, pulled into
data loading at ``data_readers/video_readers.py:234-235``). This records what
that costs at the flagship 180x240 shape.

The stage is two shape-stable jits — ``_flow_pair`` (flow UNet) and
``_interp_at_t`` (interp UNet + 2 backwarps; ``t`` is a traced argument) —
so the compile count is 2, not one per adaptive-count bucket. Per-sequence
cost = n_pairs * (flow + count * interp + (count+1) * host readbacks).

Without the pretrained checkpoint (env-blocked) the random-weight flow
magnitude is meaningless and can explode the adaptive count, so the timing
loop pins ``count`` to a realistic value (the reference's 25->1000 fps
recipe needs ~= fps_out/fps_in - 1 interpolations when flow saturates the
cap, and flow-limited counts track pixel motion/frame — single digits for
natural video). The measured per-call primitives make any other count a
multiply.

Usage: python scripts/bench_superslomo.py [n_frames] [h] [w] [count]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 180
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 240
    count = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    from v2e2v_tpu.utils.profiling import apply_platform_override

    apply_platform_override()

    import jax
    import jax.numpy as jnp

    from v2e2v_tpu.models.superslomo import Upsampler, _flow_pair, _interp_at_t

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = [
        np.uint8(
            np.clip(
                128 + 80 * np.sin(0.05 * (xx + 6.0 * i)) * np.cos(0.07 * yy)
                + rng.normal(0, 3, (h, w)),
                0, 255,
            )
        )
        for i in range(n)
    ]

    up = Upsampler((h, w))
    i0 = jnp.asarray(up.crop.pad(jnp.asarray(up._to_net(frames[0]))[None]))
    i1 = jnp.asarray(up.crop.pad(jnp.asarray(up._to_net(frames[1]))[None]))

    # compile both jits (the only 2 compiles of the stage)
    t0 = time.perf_counter()
    f01, f10 = _flow_pair(up.flow_params, i0, i1)
    jax.block_until_ready(f01)
    flow_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = _interp_at_t(up.intrp_params, i0, i1, f01, f10, 0.5)
    jax.block_until_ready(out)
    interp_compile = time.perf_counter() - t0

    mag = float(
        np.maximum(
            np.asarray(jnp.sqrt((f01**2).sum(-1)).max()),
            np.asarray(jnp.sqrt((f10**2).sum(-1)).max()),
        )
    )

    def best_ms(fn, reps=20, chains=3):
        best = float("inf")
        for _ in range(chains):
            t0 = time.perf_counter()
            for _ in range(reps):
                r = fn()
            jax.block_until_ready(r)
            best = min(best, (time.perf_counter() - t0) / reps)
        return best * 1e3

    flow_ms = best_ms(lambda: _flow_pair(up.flow_params, i0, i1)[0])
    interp_ms = best_ms(
        lambda: _interp_at_t(up.intrp_params, i0, i1, f01, f10, 0.3)
    )

    # end-to-end pair at the pinned count, including the per-frame host
    # readback + gray conversion the reader pays (denorm_to_gray)
    def pair(i, j):
        a = jnp.asarray(frames_net[i])
        b = jnp.asarray(frames_net[j])
        fa, fb = _flow_pair(up.flow_params, a, b)
        outs = [np.asarray(_interp_at_t(up.intrp_params, a, b, fa, fb, k / count))
                for k in range(1, count)]
        return outs

    frames_net = [
        np.asarray(up.crop.pad(jnp.asarray(up._to_net(f))[None])) for f in frames
    ]
    t0 = time.perf_counter()
    for i in range(n - 1):
        pair(i, i + 1)
    seq_s = time.perf_counter() - t0

    n_pairs = n - 1
    print(
        f"superslomo {h}x{w}, {n} frames ({n_pairs} pairs), count={count}: "
        f"compiles flow {flow_compile:.1f}s + interp {interp_compile:.1f}s; "
        f"flow {flow_ms:.2f} ms/pair, interp {interp_ms:.2f} ms/frame, "
        f"sequence {seq_s*1e3:.0f} ms ({seq_s*1e3/n_pairs:.1f} ms/pair "
        f"incl. host readback); random-weight flow mag {mag:.1f} px "
        f"(pretrained={up.pretrained})"
    )


if __name__ == "__main__":
    main()
