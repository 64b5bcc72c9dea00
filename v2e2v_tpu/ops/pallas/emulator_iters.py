"""Pallas kernel for the emulator's per-pair event-iteration loop.

The V2E2V default config (shot noise + refractory) pays a ~29 ms/pack
structural floor under XLA: the last-spike recurrence serializes ~288
dependent VPU passes over the full image (BENCH_NOTES.md). This kernel runs
the whole ``max_iters`` loop in-register per batch row: candidate masks,
shot-noise thresholding, suppress-only refractory gating against the
``timestamp_mem`` carried in VMEM, event counting, and the bilinear-in-time
per-bin accumulation — one HBM read of the inputs, one write of the outputs.

Semantics identical to the XLA path in ``models/emulator.py`` (tested via
interpret mode on CPU and the emulator's numpy oracle). Grid is one program
per batch row; the full plane must fit VMEM (~8.5 MB at 180x240, raised
scoped limit) — the caller falls back to the XLA path for larger planes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _iters_kernel(
    n_i, num_bins, shot, internal_rng,
    counts_ref, pol_ref, mem_ref, trf_ref, om_ref, off_ref, rand_ref,
    seed_ref, ts_step_ref, nit_ref, gate_ref, tfb_ref,
    voxel_ref, mem_out_ref, final_ref,
):
    row = pl.program_id(0)
    counts = counts_ref[0]  # [H, W] int32
    pol = pol_ref[0]  # [H, W] f32 in {-1, 0, 1}
    mem = mem_ref[0]  # [H, W] f32 last-spike time (bin units)
    trf = trf_ref[0]  # [H, W] f32 refractory period (bin units)
    # per-row scalars live whole in SMEM (a (1,1) block of a (b,1) array is
    # rejected by Mosaic's divisible-or-whole rule for b>1) — index by row
    ts_step = ts_step_ref[row, 0]
    nit = nit_ref[row, 0]  # num_iters for this batch row
    gate = gate_ref[row, 0] > 0  # refractory active (Tr > ts_step)
    tfb = tfb_ref[row, 0]  # voxel-time base of this frame pair

    if shot:
        om = om_ref[0]
        off = off_ref[0]
        if internal_rng:
            # hardware PRNG, seeded per (pair, batch row); draws replace the
            # XLA-side threefry whose generation costs ~26 ms/pack on this
            # platform regardless of key/impl (BENCH_NOTES.md)
            pltpu.prng_seed(seed_ref[row, 0])

    final = jnp.zeros_like(counts)
    accs = [jnp.zeros_like(pol) for _ in range(num_bins)]

    for i in range(n_i):
        m = counts >= (i + 1)
        active = i < nit
        if shot:
            if internal_rng:
                bits = pltpu.bitcast(
                    pltpu.prng_random_bits(pol.shape), jnp.uint32
                )
                # uniform in [0, 1) from the top 24 bits; Mosaic lacks a
                # direct uint32->f32 cast, so go through int32 (values < 2^24)
                r = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (
                    1.0 / (1 << 24)
                )
            else:
                r = rand_ref[i, 0]
            s = ((pol > 0) & (r > om)) | ((pol < 0) & (r < off))
            m = m | (s & active)
        ts_i = jnp.where(active, tfb + ts_step * (i + 1.0), 0.0)  # scalar
        # boolean algebra only — Mosaic rejects scalar-bool selects
        allow = jnp.logical_or(jnp.logical_not(gate), (ts_i - mem) > trf)
        m = m & allow
        mem = jnp.where(m & gate, ts_i, mem)
        final = final + m.astype(jnp.int32)
        ev = pol * m
        for b in range(num_bins):
            w = jnp.maximum(0.0, 1.0 - jnp.abs(ts_i - b))  # scalar weight
            accs[b] = accs[b] + ev * w

    mem_out_ref[0] = mem
    final_ref[0] = final
    for b in range(num_bins):
        voxel_ref[b, 0] = accs[b]


@partial(jax.jit, static_argnames=(
    "num_bins", "max_iters", "shot", "interpret", "internal_rng"))
def emulator_iters_pallas(
    event_counts: jax.Array,  # [B, H, W] int32
    pol: jax.Array,  # [B, H, W] f32
    timestamp_mem: jax.Array,  # [B, H, W] f32
    tr_frames: jax.Array,  # [B, H, W] f32
    one_minus_on_prob: jax.Array,  # [B, H, W] f32 (ignored when not shot)
    off_prob: jax.Array,  # [B, H, W] f32
    rand01: jax.Array,  # [I, B, H, W] f32 (or [1,B,1,1] dummy with internal_rng)
    seed: jax.Array,  # [B] uint32/int32 per-row PRNG seed (internal_rng)
    ts_step: jax.Array,  # [B] f32
    num_iters: jax.Array,  # [B] int32
    gate: jax.Array,  # [B] bool
    tf_base: jax.Array,  # scalar f32
    *,
    num_bins: int,
    max_iters: int,
    shot: bool,
    interpret: bool = False,
    internal_rng: bool = False,
):
    """Returns ``(voxel_add [B,H,W,num_bins], timestamp_mem, final_evts)``."""
    b, h, w = event_counts.shape

    def row(i):
        return (i, 0, 0)

    seed2 = seed.reshape(b, 1).astype(jnp.int32)
    ts_step2 = ts_step.reshape(b, 1)
    nit2 = num_iters.reshape(b, 1).astype(jnp.int32)
    gate2 = gate.reshape(b, 1).astype(jnp.int32)
    tfb2 = jnp.broadcast_to(tf_base.astype(jnp.float32), (b, 1))

    plane = pl.BlockSpec((1, h, w), row, memory_space=pltpu.VMEM)
    # whole (b,1) scalar array to every program (a (1,1) block of a (b,1)
    # array violates Mosaic's divisible-or-whole rule for b>1); the kernel
    # indexes by pl.program_id
    scalar = pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    ri = rand01.shape[0]
    voxel_nb_first, mem_out, final = pl.pallas_call(
        partial(_iters_kernel, max_iters, num_bins, shot, internal_rng),
        out_shape=(
            jax.ShapeDtypeStruct((num_bins, b, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        ),
        grid=(b,),
        in_specs=[
            plane,  # counts
            plane,  # pol
            plane,  # mem
            plane,  # trf
            plane,  # one_minus_on
            plane,  # off
            pl.BlockSpec(
                (ri, 1, rand01.shape[2], rand01.shape[3]),
                lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM,
            ),  # rand (dummy-sized when internal_rng)
            scalar,  # seed
            scalar,  # ts_step
            scalar,  # num_iters
            scalar,  # gate
            scalar,  # tf_base
        ],
        out_specs=(
            pl.BlockSpec((num_bins, 1, h, w), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            plane,
            plane,
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=b * h * w * max_iters * (8 + 2 * num_bins),
            bytes_accessed=(max_iters + 6 + num_bins + 2) * b * h * w * 4,
            transcendentals=0,
        ),
    )(
        event_counts, pol, timestamp_mem, tr_frames,
        one_minus_on_prob, off_prob, rand01,
        seed2, ts_step2, nit2, gate2, tfb2,
    )
    return jnp.moveaxis(voxel_nb_first, 0, -1), mem_out, final
