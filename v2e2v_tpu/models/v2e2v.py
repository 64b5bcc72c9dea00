"""V2E2V composite: HFR frames -> emulated event voxel grids -> reconstruction.

Behavioral spec from reference ``model_v2e2v.py`` (lsying009/V2E2V): the
composite owns an ``EventEmulator`` in voxel-grid mode with **hardcoded**
``leak_rate_hz=0.1`` and ``shot_noise_rate_hz=1`` (:56-57) plus a
``CistaLSTCNet`` (:61); the emulator is reset whenever the sequence id
changes (:64-69); forward (:72-128) = v2e -> e2v with a zero previous image
default, exposing ``num_events`` / ``event_voxel_grids`` for monitoring.

Functional design: ``V2E2VState`` bundles the emulator state, the CISTA
recurrent state and the previous reconstruction; a sequence change is just
``state=None`` (the caller tracks sequence ids — see the CLIs).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from .cista import CistaConfig, CistaState, cista_lstc_step, cista_zero_state
from .emulator import (
    EmulatorConfig,
    EmulatorState,
    emulate_pack,
    emulator_init_from_pack,
)


@dataclass(frozen=True)
class V2E2VConfig:
    cista: CistaConfig
    emulator: EmulatorConfig

    @staticmethod
    def from_flags(cfgs) -> "V2E2VConfig":
        """Build from a reference-compatible flag namespace
        (``utils/configs.py``), applying the composite's hardcoded emulator
        noise settings (``model_v2e2v.py:56-57``)."""
        cista = CistaConfig(
            image_dim=tuple(cfgs.image_dim),
            base_channels=cfgs.base_channels,
            depth=cfgs.depth,
            num_bins=cfgs.num_bins,
            model_mode="cista-lstc",
        )
        emulator = EmulatorConfig(
            output_mode=cfgs.event_mode,
            num_bins=cfgs.num_bins,
            pl=cfgs.pl,
            ps=cfgs.ps,
            ql=cfgs.ql,
            qs=cfgs.qs,
            pos_thres=cfgs.C,
            neg_thres=cfgs.C,
            sigma_thres=cfgs.threshold_sigma,
            cutoff_hz=cfgs.cutoff_hz,
            refractory_period_s=cfgs.refractory_period_s,
            leak_rate_hz=0.1,
            shot_noise_rate_hz=1.0,
            max_iters=getattr(cfgs, "v2e_max_iters", 32),
            unroll_iters=getattr(cfgs, "v2e_max_iters", 32),
            # CLIs default to 'auto': the fused Pallas iteration kernel
            # engages on TPU for refractory configs whose plane fits VMEM
            # (measured -26% ms/pack on v5e, BENCH_NOTES.md round 4); the
            # library default stays 'xla' for reproducibility
            iters_impl=getattr(cfgs, "v2e_iters_impl", "auto"),
        )
        return V2E2VConfig(cista=cista, emulator=emulator)


class V2E2VState(NamedTuple):
    emulator: EmulatorState
    cista: CistaState
    prev_image: jax.Array  # [B, H, W, 1]


class V2E2VOutput(NamedTuple):
    reconstruction: jax.Array  # [B, H, W, 1]
    event_voxel_grids: jax.Array  # [B, H, W, num_bins] (monitoring)
    num_events: jax.Array  # scalar int
    stats: Any = None  # EmulatorStats when with_stats (saturation diagnostics)


def v2e2v_forward(
    params: dict[str, Any],
    cfg: V2E2VConfig,
    frames: jax.Array,
    timestamps: jax.Array,
    state: V2E2VState | None,
    key: jax.Array | None = None,
    with_stats: bool = False,
) -> tuple[V2E2VOutput, V2E2VState]:
    """One V2E2V step: a pack of frames -> one reconstruction.

    Args:
      frames: ``[B, N, H, W]`` HFR intensity frames (0-255).
      timestamps: ``[B, 2]`` or ``[B, N]`` seconds.
      state: previous state, or ``None`` at a sequence start (the reference's
        ``reset_v2e``; the caller compares sequence ids).
      key: PRNG key, required when ``state is None``.
      with_stats: also return ``EmulatorStats`` in ``output.stats`` — exposes
        the PRE-clip ``max_event_count`` so saturation of the emulator's
        static ``max_iters`` bound (the reference's loop is unbounded,
        ``v2e/v2e_model.py:449``) is detectable by callers.
    """
    b, _, h, w = frames.shape
    emu_state = state.emulator if state is not None else None

    voxel, second, emu_state = emulate_pack(
        cfg.emulator, emu_state, frames, timestamps, key=key, with_stats=with_stats
    )
    stats = second if with_stats else None
    num_events = second.num_events if with_stats else second

    if state is not None:
        prev_image, cista_state = state.prev_image, state.cista
    else:
        prev_image = jnp.zeros((b, h, w, 1), voxel.dtype)
        cista_state = cista_zero_state(cfg.cista, b, voxel.dtype)

    rec, cista_state = cista_lstc_step(params, cfg.cista, voxel, prev_image, cista_state)

    new_state = V2E2VState(emulator=emu_state, cista=cista_state, prev_image=rec)
    return V2E2VOutput(rec, voxel, num_events, stats), new_state


def v2e2v_init_state(
    cfg: V2E2VConfig, frames: jax.Array, t_frames: jax.Array, key: jax.Array
) -> V2E2VState:
    """Fresh sequence-start state built from the first pack (reference
    ``reset_v2e`` + first-pack ``_init``); lets callers scan over packs with
    a uniform non-None state."""
    b, _, h, w = frames.shape
    return V2E2VState(
        emulator=emulator_init_from_pack(cfg.emulator, frames, t_frames, key),
        cista=cista_zero_state(cfg.cista, b),
        prev_image=jnp.zeros((b, h, w, 1), jnp.float32),
    )


def v2e2v_sequence(
    params: dict[str, Any],
    cfg: V2E2VConfig,
    frames_seq: jax.Array,
    ts_seq: jax.Array,
    key: jax.Array | None = None,
    state: V2E2VState | None = None,
    with_monitor: bool = False,
    with_stats: bool = False,
    remat: bool = False,
):
    """Roll the composite over a BPTT window with one ``lax.scan``.

    The reference rolls ``V2E2VNet`` in Python over ``len_sequence`` packs
    (``train.py:114-127``); a python-unrolled trace costs compile time linear
    in the window length on a platform with minutes-long compiles, so the
    whole window lives in one scan (compile once for any ``len_sequence``).

    Args:
      frames_seq: ``[T, B, N, H, W]`` packs of HFR frames.
      ts_seq: ``[T, B, N]`` per-pack timestamps (seconds).
      key: PRNG key (required when ``state is None``).
      with_monitor: also stack the per-pack voxel grids / event counts
        (the reference's ``event_voxel_grids`` / ``num_events`` monitoring
        fields) — costs ``[T, B, H, W, nb]`` of memory, debug only.
      with_stats: also return per-pack emulator saturation scalars
        (``{"num_events", "max_event_count", "clipped_pixels"}``, each
        ``[T]``) — cheap (3 scalars/pack); lets training loops detect when
        ``max_iters`` clips the reference's unbounded per-pixel event loop.
      remat: rematerialize each pack step on the backward pass (see
        ``cista_sequence``) — keeps BPTT memory O(T x carry) instead of
        O(T x all emulator/conv activations).
    Returns ``(recs [T, B, H, W, 1], final_state)``; with ``with_stats``,
    ``(recs, final_state, stats_dict)``; with ``with_monitor``,
    ``(recs, final_state, (voxels [T,B,H,W,nb], stats_dict))``.
    """
    if state is None:
        assert key is not None, "key required to initialize V2E2V state"
        state = v2e2v_init_state(cfg, frames_seq[0], ts_seq[0], key)

    if cfg.cista.fullres_impl == "fused" and "_fullres_fused" not in params:
        # loop-invariant fused-kernel composition hoisted out of the scan
        # (exactly like ``cista_sequence``): without this every scan step —
        # and its remat'd backward — re-traces the weight-space kernel folds
        from ..ops.fused import precompute_fused_kernels

        params = {**params, "_fullres_fused": precompute_fused_kernels(params)}

    collect = with_monitor or with_stats
    fwd = lambda p, frames, ts, st: v2e2v_forward(  # noqa: E731
        p, cfg, frames, ts, st, with_stats=collect
    )
    if remat:
        fwd = jax.checkpoint(fwd)

    def body(st, inp):
        frames, ts = inp
        out, st = fwd(params, frames, ts, st)
        if with_monitor:
            return st, (out.reconstruction, out.event_voxel_grids, out.stats)
        if with_stats:
            return st, (out.reconstruction, out.stats)
        return st, out.reconstruction

    state, ys = jax.lax.scan(body, state, (frames_seq, ts_seq))
    if with_monitor:
        recs, voxels, stats = ys
        return recs, state, (voxels, stats._asdict())
    if with_stats:
        recs, stats = ys
        return recs, state, stats._asdict()
    return ys, state
