"""Benchmark harness — prints ONE JSON line on stdout.

Headline metric: CISTA-LSTC E2V inference throughput (frames/sec/chip) at the
reference config (180x240, 64ch, depth 5, 5 bins) — the per-chip throughput
target from BASELINE.json. The recurrence is serial in time, so per-chip
throughput = batched independent streams x a compiled ``lax.scan`` over time.
Headline = the production serving mode: post-training INT8 core
(``CistaConfig.quant='int8'``; the half-res convs run int8xint8->int32 on
the MXU at 2x the bf16 rate) with bf16 heads/upsample, batch 16, and
STATIC calibrated activation scales (``ops/qconv.py calibrate_step_scales``
— kills the per-conv dynamic abs-max pass, +16%% over dynamic int8).
Quality gates (BENCH_NOTES.md): int8-static matches float SSIM within
0.0023 per sequence / PSNR within 0.15 dB on the TRAINED flagship
checkpoint over the full 8-sequence eval (dynamic int8: ~3-decimal SSIM,
67 dB 128-step divergence); bf16 itself matches fp32 eval metrics to the
4th decimal. Batch 16 is the measured per-chip sweet spot (batch sweep
table in BENCH_NOTES.md — serving batches independent streams, so any
batch is throughput-legitimate). Fallback chain if a path fails to
compile/run: int8-static -> dynamic int8 -> bf16 b=16. bf16/fp32/batch-1
numbers are reported on stderr.

Timing methodology: on this tunneled TPU platform ``block_until_ready`` does
NOT actually block, so each measurement chains N executions and forces a
scalar device->host fetch at the end (see .claude/skills/verify/SKILL.md).

``vs_baseline`` — the reference publishes no throughput numbers and no A100
is reachable here (BASELINE.md), so the denominator is derived from a
measured torch run plus an explicit compute model:

1. FLOPs/frame: the CISTA-LSTC step is ~23 convs -> 43.5 GFLOP at 180x240
   (counted from layer shapes; see BENCH_NOTES.md).
2. Measured anchor: the GENUINE reference ``CistaLSTCNet`` under the
   installed torch on this host's CPU runs 0.90 fps at batch 1
   (1107 ms/step, 1 vCPU; re-measure with ``--torch-cpu``) -> 39 GFLOP/s
   effective, i.e. eager torch sustains roughly 40%% of this CPU's fp32
   peak on these conv shapes — validating the FLOP count.
3. A100 extrapolation: torch 1.13 defaults to fp32 cuDNN (TF32 off since
   torch 1.12). Large-batch ResNet-class fp32 inference sustains ~10
   TFLOP/s on A100 (~50%% of the 19.5 TFLOP/s fp32 peak); a batch-1
   recurrent pipeline with python state threading is strictly worse, so
   10 TFLOP/s is a GENEROUS ceiling for the reference as written.
   => baseline = 10e12 / 43.5e9 = 230 fps/A100.

(If the reference were hand-modified for TF32 + batching, double it — the
perf roadmap targets clearing 5x against that harder bar too.)
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from v2e2v_tpu.utils.profiling import apply_platform_override

# Persistent compile cache: remote TPU compiles vary 30-350s per program on
# this platform; a warm .jax_cache turns most of the bench into execution
# time (the cache is committed to the repo as cold-start insurance).
apply_platform_override()

CISTA_LSTC_FLOPS_PER_FRAME = 43.5e9  # 180x240, 64ch, depth 5 (BENCH_NOTES.md)
A100_TORCH_EFFECTIVE_FLOPS = 10.0e12  # generous fp32-cuDNN ceiling (docstring)
A100_TORCH_FPS_ESTIMATE = A100_TORCH_EFFECTIVE_FLOPS / CISTA_LSTC_FLOPS_PER_FRAME


def measure_torch_cpu_fps(steps: int = 5) -> float:
    """Measure the GENUINE reference CistaLSTCNet under installed torch (CPU),
    batch-1 streaming like the reference CLIs. Run via ``bench.py --torch-cpu``."""
    import sys as _sys

    _sys.path.insert(0, "/root/reference")
    import torch

    from e2v.e2v_model import CistaLSTCNet

    net = CistaLSTCNet(image_dim=(180, 240), base_channels=64, depth=5, num_bins=5)
    net.eval()
    ev = torch.randn(1, 5, 180, 240)
    pi = torch.rand(1, 1, 180, 240)
    with torch.no_grad():
        out, st = net(ev, pi, None)  # warmup
        t0 = time.perf_counter()
        for _ in range(steps):
            out, st = net(ev, pi, st)
        dt = time.perf_counter() - t0
    return steps / dt


def bench_e2v(batch: int, steps: int = 64, dtype=jnp.float32, chain: int = 6,
              quant: str = "none") -> float:
    from v2e2v_tpu.models.cista import (
        CistaConfig,
        cista_sequence,
        init_cista_lstc,
    )

    static = quant == "int8-static"
    cfg = CistaConfig(image_dim=(180, 240), base_channels=64, depth=5, num_bins=5,
                      quant="int8" if static else quant)
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)

    if static:
        # calibrate static activation scales on 2 steps of the bench
        # distribution (one traced compile; ops/qconv.py). cista_sequence
        # respects a pre-injected "_quant".
        from v2e2v_tpu.models.cista import cista_lstc_step_int8, cista_zero_state
        from v2e2v_tpu.ops.fused import precompute_fused_kernels
        from v2e2v_tpu.ops.qconv import calibrate_step_scales, quantize_core

        qp = quantize_core(params)
        p_cal = {**params, "_quant": qp,
                 "_fullres_fused": precompute_fused_kernels(params)}
        cseq = jax.random.normal(jax.random.PRNGKey(7), (2, 2, 180, 240, 5), dtype)
        cprev = jnp.zeros((2, 180, 240, 1), dtype)
        cstate = cista_zero_state(cfg, 2, dtype)

        def run_calib():
            s = cstate
            for t in range(cseq.shape[0]):
                _, s = cista_lstc_step_int8(p_cal, cfg, cseq[t], cprev, s)

        qp = calibrate_step_scales(run_calib, qp, depth=cfg.depth, margin=1.1)
        params = {**params, "_quant": qp}
        # static scales unlock the requant chain (int8 ISTA-code storage
        # between iterations): 5.206 -> 5.092 ms/step measured at b=16
        import dataclasses

        cfg = dataclasses.replace(cfg, requant_chain=True)

    @jax.jit
    def run(params, seq):
        recs, _ = cista_sequence(params, cfg, seq)
        return recs[-1].astype(jnp.float32).sum()

    seq = jax.random.normal(jax.random.PRNGKey(1), (steps, batch, 180, 240, 5), dtype)
    float(run(params, seq))  # compile + warmup

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = None
        for _ in range(chain):
            r = run(params, seq)
        float(r)  # force full execution via scalar fetch
        best = min(best, (time.perf_counter() - t0) / chain)
    return batch * steps / best


def bench_v2e2v(batch: int = 8, packs: int = 16, n_frames: int = 10,
                chain: int = 4) -> float:
    """End-to-end V2E2V throughput (reconstructions/s/chip): HFR frames ->
    emulated voxel grids -> CISTA reconstruction through ``v2e2v_sequence``,
    with the CLI-default emulator backend (``iters_impl='auto'`` — the fused
    Pallas iteration kernel on refractory configs; VERDICT r4 #2). The
    reference's composite loop being beaten: ``v2e/v2e_model.py:449-502`` +
    ``model_v2e2v.py:72-128``, python-rolled at batch 1."""
    import numpy as np

    from v2e2v_tpu.models.cista import init_cista_lstc
    from v2e2v_tpu.models.emulator import EmulatorConfig
    from v2e2v_tpu.models.v2e2v import V2E2VConfig, v2e2v_sequence
    from v2e2v_tpu.models.cista import CistaConfig

    cfg = V2E2VConfig(
        cista=CistaConfig(image_dim=(180, 240), base_channels=64, depth=5,
                          num_bins=5),
        emulator=EmulatorConfig(
            pos_thres=0.6, neg_thres=0.6, sigma_thres=0.03, pl=1.5, ps=0.5,
            cutoff_hz=200.0, ql=1.0, qs=0.0, refractory_period_s=0.001,
            leak_rate_hz=0.1, shot_noise_rate_hz=1.0, iters_impl="auto",
        ),
    )
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg.cista)
    rng = np.random.default_rng(0)
    h, w = 180, 240
    base = rng.uniform(30, 200, (batch, 1, 1, h, w)).astype(np.float32)
    rate = rng.uniform(-0.05, 0.12, (batch, 1, 1, h, w)).astype(np.float32)
    i_idx = np.arange(packs * n_frames, dtype=np.float32).reshape(
        1, packs, n_frames, 1, 1
    )
    frames = np.clip(base * (1 + rate * i_idx * 0.02), 0, 255)
    frames_seq = jnp.asarray(np.moveaxis(frames, 1, 0))  # [T,B,N,H,W]
    ts = (i_idx * 0.004).reshape(1, packs, n_frames) + np.zeros(
        (batch, 1, 1), np.float32
    )
    ts_seq = jnp.asarray(np.moveaxis(ts, 1, 0))  # [T,B,N]

    run = jax.jit(
        lambda p, f, t: v2e2v_sequence(
            p, cfg, f, t, key=jax.random.key(7, impl="rbg")
        )[0][-1].astype(jnp.float32).sum()
    )
    float(run(params, frames_seq, ts_seq))  # compile + warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = None
        for _ in range(chain):
            r = run(params, frames_seq, ts_seq)
        float(r)
        best = min(best, (time.perf_counter() - t0) / chain)
    return batch * packs / best


def bench_e2v_train(batch: int = 8, seq_len: int = 15, steps: int = 8) -> float:
    """E2V training throughput (samples/s/chip) at the reference recipe shape
    (180x240, len_sequence=15, batch 8, fp32, L1+SSIM many-to-one loss,
    remat'd BPTT scan) — the step ``train_e2v.py`` runs in production
    (VERDICT r4 #8). Implied MFU is printed on stderr using the
    fwd+bwd+remat ~= 4x forward-FLOPs convention."""
    import optax

    from v2e2v_tpu.models.cista import CistaConfig, init_cista_lstc
    from v2e2v_tpu.parallel.mesh import make_e2v_train_step, make_mesh

    cfg = CistaConfig(image_dim=(180, 240), base_channels=64, depth=5,
                      num_bins=5)
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)
    mesh = make_mesh()
    step = make_e2v_train_step(cfg, tx, mesh)

    seq = jax.random.normal(
        jax.random.PRNGKey(1), (seq_len, batch, 180, 240, 5), jnp.float32
    )
    gt = jax.random.uniform(jax.random.PRNGKey(2), (batch, 180, 240, 1))
    params, opt_state, loss = step(params, opt_state, seq, gt)  # compile
    float(loss)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            params, opt_state, loss = step(params, opt_state, seq, gt)
        float(loss)
        best = min(best, (time.perf_counter() - t0) / steps)
    sps = batch / best
    # MFU: ~4x the forward conv FLOPs per frame (fwd + ~2x bwd + ~1x remat
    # recompute), T frames per sample, vs the v5e's 197 TFLOP/s bf16 peak
    # (fp32 runs through the same MXU at half rate -> use 98.5 TF/s).
    mfu = sps * seq_len * CISTA_LSTC_FLOPS_PER_FRAME * 4 / 98.5e12
    print(f"[bench] e2v_train: {best*1e3:.1f} ms/step, {sps:.2f} samples/s, "
          f"~{mfu*100:.0f}% MFU (fp32, 4x-fwd convention)",
          file=sys.stderr, flush=True)
    return sps


def bench_voxelize(n_events: int = 15000, capacity: int = 16384, chain: int = 50) -> float:
    import numpy as np

    from v2e2v_tpu.ops.voxel import events_to_voxel_grid

    rng = np.random.default_rng(0)
    t = np.full(capacity, 9e9, np.float32)
    t[:n_events] = np.sort(rng.uniform(0, 0.03, n_events))
    args = [
        jnp.asarray(t),
        jnp.asarray(rng.integers(0, 240, capacity).astype(np.int32)),
        jnp.asarray(rng.integers(0, 180, capacity).astype(np.int32)),
        jnp.asarray(rng.choice([0.0, 1.0], capacity).astype(np.float32)),
        jnp.asarray(n_events),
    ]

    @jax.jit
    def vox(t, x, y, p, n):
        return events_to_voxel_grid(
            t, x, y, p, n, num_bins=5, width=240, height=180, method="sort"
        ).sum()

    float(vox(*args))
    t0 = time.perf_counter()
    r = None
    for _ in range(chain):
        r = vox(*args)
    float(r)
    return n_events * chain / (time.perf_counter() - t0)


def bench_v2e_pack(n_frames: int = 10, hw=(180, 240), chain: int = 20) -> float:
    """V2E2V emulator pack step (reference still_life config), ms/pack."""
    import numpy as np

    from v2e2v_tpu.models.emulator import EmulatorConfig, emulate_pack

    h, w = hw
    cfg = EmulatorConfig(
        pos_thres=0.6, neg_thres=0.6, sigma_thres=0.03, pl=1.5, ps=0.5,
        cutoff_hz=200.0, ql=1.0, qs=0.0, refractory_period_s=0.001,
        leak_rate_hz=0.1, shot_noise_rate_hz=1.0,
    )
    rng = np.random.default_rng(0)
    base = rng.uniform(30, 200, (h, w)).astype(np.float32)
    rate = rng.uniform(-0.05, 0.12, (h, w)).astype(np.float32)
    fs = jnp.asarray(
        np.stack(
            [np.clip(base * (1 + rate * i * 0.2), 0, 255) for i in range(n_frames)], 0
        )[None]
    )
    ts = jnp.asarray((np.arange(n_frames, dtype=np.float32)[None]) * 0.004)
    # rbg: the TPU-native generator the CLIs default to (--rng_impl). The
    # noise streams are simulation noise, not crypto; threefry costs ~26 ms
    # of the pack in XLA-side random generation (30 -> 3 ms/pack).
    _, _, st = emulate_pack(cfg, None, fs, ts, key=jax.random.key(7, impl="rbg"))
    f = jax.jit(lambda s, a, b: emulate_pack(cfg, s, a, b))
    v, n, st0 = f(st, fs, ts)
    float(n)
    # best-of-3: the first timed chain after compile lands ~10x slow on this
    # platform (late autotune/upload); steady state is what serving sees
    best = float("inf")
    for _ in range(3):
        st_l = st0
        t0 = time.perf_counter()
        for _ in range(chain):
            v, n, st_l = f(st_l, fs, ts)
        float(v.sum())
        best = min(best, (time.perf_counter() - t0) / chain * 1e3)
    return best


def wait_for_backend(max_wait_s: float) -> bool:
    """Wait for the TPU backend to become reachable.

    The tunneled platform can be down for extended periods with
    ``jax.devices()`` blocking indefinitely (observed: multi-hour outages);
    probing in a SUBPROCESS keeps this process's backend state clean and
    lets us bound each attempt. Returns False if the backend never came up.
    """
    import subprocess

    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=180, capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        attempt += 1
        if time.time() >= deadline:
            return False
        print(f"[bench] TPU backend unavailable (attempt {attempt}); retrying",
              file=sys.stderr, flush=True)
        time.sleep(min(300.0, max(0.0, deadline - time.time())))


def main():
    if "--torch-cpu" in sys.argv:
        fps = measure_torch_cpu_fps()
        eff = fps * CISTA_LSTC_FLOPS_PER_FRAME
        print(
            f"reference torch-cpu: {fps:.2f} fps b=1 "
            f"({eff/1e9:.1f} GFLOP/s effective)"
        )
        return

    if not wait_for_backend(float(os.environ.get("V2E2V_BENCH_WAIT_S", "3600"))):
        print("[bench] TPU backend unreachable after wait budget; no "
              "measurement possible", file=sys.stderr)
        sys.exit(3)

    # Remote compile times on this platform vary 10s-500s per program; the
    # headline must always land, so measure it first and fit the secondary
    # metrics into the remaining time budget. Round 3's 480s default lost
    # the int8 number and ALL extras to one slow compile (BENCH_r03.json
    # "budget hit") — the budget is generous now, each metric logs its own
    # wall time, and the list is ordered most- to least-important so the
    # budget starves the least important last.
    t_start = time.time()
    budget_s = float(os.environ.get("V2E2V_BENCH_BUDGET_S", "1500"))

    t0 = time.time()
    head_mode = "int8-static b=16"
    try:
        fps_head = bench_e2v(batch=16, dtype=jnp.bfloat16, quant="int8-static")
    except Exception as e:
        print(f"[bench] int8-static headline failed ({e}); trying dynamic int8",
              file=sys.stderr, flush=True)
        head_mode = "int8 b=16"
        try:
            fps_head = bench_e2v(batch=16, dtype=jnp.bfloat16, quant="int8")
        except Exception as e2:
            print(f"[bench] int8 headline failed ({e2}); falling back to bf16",
                  file=sys.stderr, flush=True)
            head_mode = "bf16 b=16"
            fps_head = bench_e2v(batch=16, dtype=jnp.bfloat16)
    print(f"[bench] headline {head_mode}: {fps_head:.1f} fps "
          f"[{time.time() - t0:.0f}s]", file=sys.stderr, flush=True)

    extras = {}
    for name, fn in (
        ("e2v_int8_dyn_b16_fps",
         lambda: bench_e2v(batch=16, dtype=jnp.bfloat16, quant="int8")),
        ("e2v_bf16_b16_fps", lambda: bench_e2v(batch=16, dtype=jnp.bfloat16)),
        ("v2e2v_fps", bench_v2e2v),
        ("e2v_train_samples_s", bench_e2v_train),
        ("v2e_pack_ms", bench_v2e_pack),
        ("voxelize_mev_s", lambda: bench_voxelize() / 1e6),
        ("e2v_bf16_b8_fps", lambda: bench_e2v(batch=8, dtype=jnp.bfloat16)),
        ("e2v_fp32_b8_fps", lambda: bench_e2v(batch=8)),
        ("e2v_fp32_b1_fps", lambda: bench_e2v(batch=1)),
    ):
        if time.time() - t_start > budget_s:
            print(f"[bench] budget hit; skipping {name}+", file=sys.stderr)
            break
        try:
            t0 = time.time()
            extras[name] = round(float(fn()), 1)
            print(f"[bench] {name}: {extras[name]} [{time.time() - t0:.0f}s]",
                  file=sys.stderr, flush=True)
        except Exception as e:  # secondary metrics must not sink the headline
            print(f"[bench] {name} failed: {e}", file=sys.stderr)

    print(f"[bench] e2v {head_mode}: {fps_head:.0f} fps/chip | extras: {extras}",
          file=sys.stderr)
    value = fps_head
    print(
        json.dumps(
            {
                "metric": "e2v_cista_lstc_fps_180x240",
                "value": round(value, 1),
                "unit": "frames/s/chip",
                "vs_baseline": round(value / A100_TORCH_FPS_ESTIMATE, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
