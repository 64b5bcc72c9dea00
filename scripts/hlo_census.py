#!/usr/bin/env python
"""Compile the int8-static CISTA step AOT and census the optimized HLO:
buffer roots by dtype/size, layout tiling (is C=64 padded to 128 lanes?),
and the executable's memory analysis.

Usage: python scripts/hlo_census.py [batch] [--dump FILE]
"""

from __future__ import annotations

import collections
import re
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from v2e2v_tpu.models.cista import (
    CistaConfig,
    cista_lstc_step_int8,
    cista_zero_state,
    init_cista_lstc,
)
from v2e2v_tpu.ops.fused import precompute_fused_kernels
from v2e2v_tpu.ops.qconv import calibrate_step_scales, quantize_cista_core


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    dump = None
    if "--dump" in sys.argv:
        dump = sys.argv[sys.argv.index("--dump") + 1]
    dtype = jnp.bfloat16
    cfg = CistaConfig(image_dim=(180, 240), quant="int8")
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    qp = quantize_cista_core(params)
    params["_fullres_fused"] = precompute_fused_kernels(params)

    ev = jax.random.normal(jax.random.PRNGKey(1),
                           (batch, 180, 240, cfg.num_bins), dtype)
    img = jnp.zeros((batch, 180, 240, 1), dtype)
    state = cista_zero_state(cfg, batch, dtype)

    def run_steps():
        p = dict(params, _quant=qp)
        cista_lstc_step_int8(p, cfg, ev, img, state)

    qps = calibrate_step_scales(run_steps, qp, depth=cfg.depth, margin=1.25)

    def step(ev, img, state):
        p = dict(params, _quant=qps)
        return cista_lstc_step_int8(p, cfg, ev, img, state)

    compiled = jax.jit(step).lower(ev, img, state).compile()
    ma = compiled.memory_analysis()
    print(f"temp: {ma.temp_size_in_bytes/1e6:.1f} MB  "
          f"output: {ma.output_size_in_bytes/1e6:.1f} MB  "
          f"args: {ma.argument_size_in_bytes/1e6:.1f} MB")

    txt = compiled.as_text()
    if dump:
        with open(dump, "w") as f:
            f.write(txt)
        print(f"wrote {len(txt)/1e6:.1f} MB HLO to {dump}")

    # census: root instructions with explicit layouts, grouped by dtype+shape
    pat = re.compile(r"(s8|s32|bf16|f32)\[([0-9,]+)\]\{([^}]*)\}")
    sizes = {"s8": 1, "s32": 4, "bf16": 2, "f32": 4}
    # count each (dtype, shape, layout) of fusion/custom-call ROOT outputs
    roots = collections.Counter()
    for line in txt.splitlines():
        ls = line.strip()
        if not (ls.startswith("%fusion") or ls.startswith("%custom-call")
                or ls.startswith("ROOT %fusion")
                or ls.startswith("ROOT %custom-call")
                or " = (" in ls and ("fusion(" in ls or "custom-call(" in ls)
                or ("= s8[" in ls or "= s32[" in ls or "= bf16[" in ls
                    or "= f32[" in ls)
                and ("fusion(" in ls or "custom-call(" in ls)):
            continue
        for m in pat.finditer(ls.split(" = ", 1)[-1].split("(", 1)[0]):
            dt, shape, layout = m.groups()
            n = 1
            for d in shape.split(","):
                n *= int(d)
            roots[(dt, shape, layout, n * sizes[dt])] += 1
    tot = collections.Counter()
    print("\ntop buffer roots (dtype[shape]{layout} x count = MB):")
    items = sorted(roots.items(), key=lambda kv: -kv[0][3] * kv[1])
    for (dt, shape, layout, bts), cnt in items[:25]:
        tot[dt] += bts * cnt
        print(f"  {dt}[{shape}]{{{layout}}} x{cnt} = {bts*cnt/1e6:8.1f} MB")
    for (dt, shape, layout, bts), cnt in items[25:]:
        tot[dt] += bts * cnt
    print("\nby dtype:", {k: f"{v/1e6:.0f} MB" for k, v in tot.items()})


if __name__ == "__main__":
    main()
