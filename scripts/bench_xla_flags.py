#!/usr/bin/env python
"""Sweep XLA compiler flags on the headline bench (e2v bf16 b=16).

Each flag set needs a fresh process (XLA_FLAGS is read once at backend
init), so this spawns one subprocess per variant and compares fps. The
baseline (no extra flags) runs FIRST and LAST to bound run-to-run drift —
any variant inside the baseline spread is noise, not a win.

Candidate flags (single-chip, conv-heavy recurrent workload):
- xla_tpu_scoped_vmem_limit_kib: raises the VMEM budget fusions may use;
  conv+elementwise fusions sometimes spill at the default budget.
- xla_enable_async_all_gather etc. are collective-only — irrelevant here.
- xla_tpu_licm_* / flash-attention flags — irrelevant (no attention).

Usage: python scripts/bench_xla_flags.py [--quant] [batch]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp
from v2e2v_tpu.models.cista import CistaConfig, cista_sequence, init_cista_lstc

STEPS = 64
batch = {batch}
cfg = CistaConfig(image_dim=(180, 240), quant={quant!r})
params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
seq = jax.random.normal(jax.random.PRNGKey(1), (STEPS, batch, 180, 240, 5),
                        jnp.bfloat16)

@jax.jit
def run(params, seq):
    recs, _ = cista_sequence(params, cfg, seq)
    return recs[-1].astype(jnp.float32).sum()

float(run(params, seq))
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    r = None
    for _ in range(6):
        r = run(params, seq)
    float(r)
    best = min(best, (time.perf_counter() - t0) / 6)
print("RESULT_FPS", batch * STEPS / best)
"""

VARIANTS = [
    ("baseline", ""),
    ("vmem32m", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    ("vmem64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem96m", "--xla_tpu_scoped_vmem_limit_kib=98304"),
    ("baseline2", ""),
]


def run_variant(name: str, flags: str, batch: int, quant: str) -> float | None:
    env = dict(os.environ)
    if flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
    code = CHILD.format(repo=REPO, batch=batch, quant=quant)
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True,
            text=True, timeout=900,
        )
    except subprocess.TimeoutExpired:
        print(f"{name:24s} TIMEOUT", flush=True)
        return None
    fps = None
    for line in r.stdout.splitlines():
        if line.startswith("RESULT_FPS"):
            fps = float(line.split()[1])
    if fps is None:
        tail = (r.stderr or "").strip().splitlines()[-3:]
        print(f"{name:24s} FAILED rc={r.returncode} {' | '.join(tail)}", flush=True)
        return None
    print(f"{name:24s} {fps:8.1f} fps  [{flags or 'no extra flags'}]", flush=True)
    return fps


def main():
    argv = sys.argv[1:]
    quant = "none"
    if "--quant" in argv:
        quant = "int8"
        argv.remove("--quant")
    batch = int(argv[0]) if argv else 16
    results = {}
    for name, flags in VARIANTS:
        fps = run_variant(name, flags, batch, quant)
        if fps is not None:
            results[name] = round(fps, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
