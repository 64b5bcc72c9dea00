#!/usr/bin/env python
"""Measure the Super-SloMo upsampling stage (VERDICT r4 #7).

The ``upsampling`` reader runs ``Upsampler.upsampling`` ONCE per sequence at
init (reference ``upsampling/utils/upsamp_sequence.py:87-133``, pulled into
data loading at ``data_readers/video_readers.py:234-235``). This records what
that costs at the flagship 180x240 shape: ms/sequence, ms/frame-pair, the
adaptive interpolation counts, and how many XLA compiles the stage triggers
(the flow/interp steps are shape-stable jits — ``t`` is a dynamic argument —
so the expected compile count is 2, not one per bucket).

Usage: python scripts/bench_superslomo.py [n_frames] [h] [w]
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

    from v2e2v_tpu.utils.profiling import apply_platform_override

    apply_platform_override()

    import jax

    from v2e2v_tpu.models.superslomo import Upsampler

    rng = np.random.default_rng(0)
    # moving-gradient frames so the flow magnitude (and so the adaptive
    # interp count) is realistic rather than ~0
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
    ts = np.arange(n, dtype=np.float64) / 25.0

    up = Upsampler((h, w))
    compiles = {"n": 0}
    # count XLA client compiles via jax's monitoring hooks
    from jax import monitoring

    def on_event(event, **kw):
        if "compilation" in event or "compile" in event:
            compiles["n"] += 1

    try:
        monitoring.register_event_listener(on_event)
    except Exception:
        pass

    t0 = time.perf_counter()
    out, out_ts = up.upsampling(frames, ts)
    cold = time.perf_counter() - t0

    t0 = time.perf_counter()
    out, out_ts = up.upsampling(frames, ts)
    warm = time.perf_counter() - t0

    n_pairs = n - 1
    counts = len(out_ts) - n  # interpolated frames added
    print(
        f"superslomo {h}x{w}, {n} frames ({n_pairs} pairs): "
        f"cold {cold*1e3:.0f} ms, warm {warm*1e3:.0f} ms "
        f"({warm*1e3/n_pairs:.1f} ms/pair), "
        f"{len(out_ts)} output frames ({counts} interpolated), "
        f"~{compiles['n']} compile events"
    )


if __name__ == "__main__":
    main()
