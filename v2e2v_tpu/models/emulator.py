"""DVS event-camera emulator with sensing diversity, TPU-first.

Behavioral spec from reference ``v2e/v2e_model.py`` (lsying009/V2E2V, itself
modified from SensorsINI/v2e):

- ``_init`` (:156-240): per-pixel Gaussian contrast thresholds at ``pl*C``
  with the ``[0::2, 0::2]`` lattice overwritten by ``ps*C`` draws (sensing
  diversity), clamped >= 0.01; shot-noise probability scalers; log-normal
  leak-rate array; refractory ``timestamp_mem`` initialized to ``-Tr``.
- ``forward`` (:290-536): per frame pair — leak subtraction, diff against the
  memorized base log frame, per-pixel event counts ``floor(|diff|/C)``, an
  iteration loop emitting at most one event per pixel per iteration at
  linearly spaced timestamps, refractory masking, optional shot noise, and
  bilinear-in-time accumulation into a voxel grid; then
  ``base += pol*count*C`` and zero-mean/unit-std normalization of the grid.

TPU-first design (not a port):

- **No scatters.** The reference scatter-adds events into the grid with
  ``index_add_`` (:489-502). Here each iteration's event timestamp is a
  per-batch scalar, so the bilinear-in-time split is a *dense* per-bin AXPY:
  ``voxel[..., b] += max(0, 1 - |t - b|) * pol * mask`` — pure VPU work.
- **Static shapes.** The data-dependent iteration count becomes a
  ``fori_loop`` with a traced bound clipped to ``cfg.max_iters``; everything
  else is masking. The emulator has no trainable parameters (matching the
  reference — thresholds are not nn.Parameters), so outputs carry
  ``stop_gradient`` and the dynamic-bound loop is legal under jit.
- **Functional state.** The reference's mutable module state becomes an
  explicit ``EmulatorState`` pytree threaded through ``emulate_pack``;
  sequence reset = pass ``state=None``.

Deliberate deviation (bug fix, not replicated): the reference refractory
filter *replaces* the event mask with ``(ts*mask - timestamp_mem) > Tr``
(:470-471), which can spuriously re-trigger sub-threshold pixels right after
a pack boundary (where ``timestamp_mem`` was rebased negative). Here the
filter only ever *suppresses* events: ``mask &= (ts - timestamp_mem) > Tr``.
The two agree whenever no pack boundary has occurred or refractory is off.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.numerics import (
    lin_log,
    low_pass_filter_step,
    rescale_intensity_frame,
    subtract_leak_current,
)
from ..ops.voxel import event_preprocess


@dataclass(frozen=True)
class EmulatorConfig:
    """Static emulator configuration (reference ctor args, :36-57)."""

    output_mode: str = "voxel_grid"
    pl: float = 1.0
    ps: float = 1.0
    ql: float = 1.0
    qs: float = 1.0
    num_bins: int = 5
    pos_thres: float = 0.2
    neg_thres: float = 0.2
    sigma_thres: float = 0.03
    cutoff_hz: float = 0.0
    leak_rate_hz: float = 0.1
    refractory_period_s: float = 0.0
    shot_noise_rate_hz: float = 0.0
    leak_jitter_fraction: float = 0.1
    noise_rate_cov_decades: float = 0.1
    max_iters: int = 32  # static bound on events/pixel per frame pair
    shot_noise_inten_factor: float = 0.25
    # scan unroll factors: per-iteration dispatch is expensive on this
    # platform (~0.3 ms/step) and PARTIAL unroll of the refractory scan
    # (e.g. 8) triggers pathological layout churn on its stacked bool
    # outputs (30 ms/pack vs 2.5 ms at full unroll — see BENCH_NOTES.md)
    unroll_pairs: int = 1
    unroll_iters: int = 32  # keep == max_iters (full unroll)
    # iteration-loop backend: 'xla' (default) or 'pallas' (fused VMEM
    # kernel, ops/pallas/emulator_iters.py — MEASURED on real v5e round 4:
    # 3.40 vs 4.59 ms/pack end-to-end on the still_life+refractory config,
    # a 26% win, ~4 s Mosaic compile; the XLA side is bistable across
    # sessions (2.5–30 ms) so the default stays 'xla' for reproducibility
    # — set 'pallas' for serving refractory configs; see BENCH_NOTES.md)
    # or 'auto' (pallas on TPU for refractory configs when the plane fits
    # VMEM)
    iters_impl: str = "xla"


class EmulatorState(NamedTuple):
    """Functional emulator state (the reference's mutable attributes)."""

    base_log_frame: jax.Array  # [B,H,W] memorized lin-log values
    lp_log_frame: jax.Array  # [B,H,W] IIR lowpass state
    pos_thres: jax.Array  # [B,H,W] per-pixel ON threshold
    neg_thres: jax.Array  # [B,H,W] per-pixel OFF threshold
    pos_thres_pre_prob: jax.Array  # [B,H,W] shot-noise scaler (thres/nominal)
    neg_thres_pre_prob: jax.Array
    noise_rate_array: jax.Array  # [B,H,W] log-normal leak rates
    timestamp_mem: jax.Array  # [B,H,W] last-spike time in bin units
    t_previous: jax.Array  # [B] (or scalar) previous frame time, seconds
    key: jax.Array  # PRNG key


def _lattice_mask(h: int, w: int) -> jax.Array:
    hh = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) % 2) == 0
    ww = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) % 2) == 0
    return jnp.logical_and(hh, ww)


def emulator_init(
    key: jax.Array,
    cfg: EmulatorConfig,
    frame_log: jax.Array,
    tr_frames: jax.Array,
    t0: jax.Array,
) -> EmulatorState:
    """Initialize state from the first lin-log frame (reference ``_init``).

    frame_log: ``[B, H, W]``; tr_frames: ``[B, H, W]`` refractory period in
    bin units; t0: scalar or per-row ``[B]`` first timestamp (seconds).
    """
    b, h, w = frame_log.shape
    lattice = _lattice_mask(h, w)

    k_pos_l, k_pos_s, k_neg_l, k_neg_s, k_leak, k_next = jax.random.split(key, 6)

    def diverse_threshold(kl, ks, nominal):
        if cfg.sigma_thres <= 0:
            # reference keeps the scalar nominal threshold when sigma==0
            return jnp.full((b, h, w), nominal, jnp.float32)
        large = cfg.pl * nominal + cfg.sigma_thres * jax.random.normal(
            kl, (b, h, w), jnp.float32
        )
        small = cfg.ps * nominal + cfg.sigma_thres * jax.random.normal(
            ks, (b, h, w), jnp.float32
        )
        return jnp.maximum(jnp.where(lattice, small, large), 0.01)

    pos = diverse_threshold(k_pos_l, k_pos_s, cfg.pos_thres)
    neg = diverse_threshold(k_neg_l, k_neg_s, cfg.neg_thres)

    noise_rate = jnp.ones((b, h, w), jnp.float32)
    if cfg.leak_rate_hz > 0:
        noise_rate = jnp.exp(
            math.log(10.0)
            * cfg.noise_rate_cov_decades
            * jax.random.normal(k_leak, (b, h, w), jnp.float32)
        )

    return EmulatorState(
        base_log_frame=frame_log,
        lp_log_frame=frame_log,
        pos_thres=pos,
        neg_thres=neg,
        pos_thres_pre_prob=pos / cfg.pos_thres,
        neg_thres_pre_prob=neg / cfg.neg_thres,
        noise_rate_array=noise_rate,
        timestamp_mem=-tr_frames,
        t_previous=jnp.broadcast_to(jnp.asarray(t0, jnp.float32), (b,)),
        key=k_next,
    )


def _per_row_times(t_frames: jax.Array, n: int) -> jax.Array:
    """Per-batch-row frame times ``[B, N]`` (float32).

    Deliberate improvement over the reference, which reads batch row 0's
    timestamps for every row (``v2e_model.py:307-311``, a batch-1 artifact):
    under data-parallel batching rows hold different sequences with different
    wall-clock timing, so delta_time / leak / shot-noise rates are computed
    per row here. Identical to the reference for B=1 or shared timestamps.
    """
    if t_frames.shape[1] == 2:
        return jax.vmap(lambda a, b: jnp.linspace(a, b, n))(
            t_frames[:, 0], t_frames[:, -1]
        ).astype(jnp.float32)
    return t_frames[:, :n].astype(jnp.float32)


def emulator_init_from_pack(
    cfg: EmulatorConfig, frames: jax.Array, t_frames: jax.Array, key: jax.Array
) -> EmulatorState:
    """Build a fresh ``EmulatorState`` from a pack's FIRST frame (the
    reference's first-pack ``_init``), for callers that ``lax.scan`` over
    packs with a uniform non-None state: the pack-boundary rebase inside
    ``emulate_pack`` is a no-op on a freshly initialized state, so
    ``emulate_pack(cfg, init_from_pack(pack0), pack0, ...)`` ==
    ``emulate_pack(cfg, None, pack0, ..., key)``.
    """
    b, n, h, w = frames.shape
    window = (t_frames[:, -1] - t_frames[:, 0]).astype(jnp.float32)
    tr = ((cfg.num_bins - 1) * jnp.float32(cfg.refractory_period_s)) * (1.0 / window)
    tr_frames = jnp.broadcast_to(tr[:, None, None], (b, h, w)).astype(jnp.float32)
    if t_frames.shape[1] not in (2, n):
        if t_frames.shape[1] != n + 1:  # same contract as _prepare_pack
            raise ValueError(
                f"t_frames has {t_frames.shape[1]} entries for {n} frames; "
                "expected 2 (endpoints), N, or N+1"
            )
        t_frames = t_frames[:, :n]
    t_float = _per_row_times(t_frames, n)
    return emulator_init(key, cfg, lin_log(frames)[:, 0], tr_frames, t_float[:, 0])


def validate_pack_times(t_frames, t_previous=None):
    """Host-side input-contract check for pack timestamps (CLI boundary).

    The reference raises on non-advancing frame times
    (``v2e/v2e_model.py:335-338``: ``t_float_frames[1] <= self.t_previous``);
    the jitted emulator cannot perform data-dependent raises, so callers
    feeding untrusted reader output validate here BEFORE dispatch.

    Args:
      t_frames: ``[N]``, ``[B, N]``, ``[B, 2]`` or ``[B, N+1]`` timestamps
        (seconds), any array-like.
      t_previous: optional per-row (or scalar) last frame time of the
        previous pack; continuation packs share the boundary frame, so
        the FIRST entry may equal it but the second must be later.
    Returns the per-row last timestamps ``[B]`` (float64 numpy) to thread
    into the next call.
    Raises ``ValueError`` on non-increasing times within the pack or a pack
    that does not advance past ``t_previous``.
    """
    import numpy as np

    ts = np.asarray(t_frames, np.float64)
    if ts.ndim == 1:
        ts = ts[None]
    if np.any(np.diff(ts, axis=1) <= 0):
        bad = float(ts[np.unravel_index(np.argmin(np.diff(ts, axis=1)),
                                        np.diff(ts, axis=1).shape)[0], 0])
        raise ValueError(
            "frame times must be strictly increasing within a pack "
            f"(got a non-increasing step in the pack starting at t={bad})"
        )
    if t_previous is not None:
        prev = np.asarray(t_previous, np.float64).reshape(-1)
        second = ts[:, 1] if ts.shape[1] > 1 else ts[:, 0]
        if np.any(second <= prev):
            i = int(np.argmax(second <= prev))
            raise ValueError(
                f"this frame time={second[i]} must be later than "
                f"previous frame time={prev[min(i, prev.size - 1)]}"
            )
    return ts[:, -1]


def _prepare_pack(cfg, state, frames, t_frames, key):
    """Shared pack preparation (reference ``forward`` :290-345): timestamps,
    refractory scale, lin-log transform, state init or pack-boundary rebase,
    and IIR low-pass filtering. Returns ``(state, scan_inputs, consts)``."""
    b, n, h, w = frames.shape
    # refractory period in bin units, computed from the ORIGINAL timestamp
    # span BEFORE any truncation (the reference computes Tr from the full
    # [B, N+1] row on continuation packs, ``v2e_model.py:317``) and with the
    # reference's float32 op order (scale * reciprocal, not a division) so
    # boundary comparisons like ``tr > ts_step`` agree bit-for-bit.
    window = (t_frames[:, -1] - t_frames[:, 0]).astype(jnp.float32)
    tr = ((cfg.num_bins - 1) * jnp.float32(cfg.refractory_period_s)) * (
        1.0 / window
    )  # [B]
    tr_frames = jnp.broadcast_to(tr[:, None, None], (b, h, w)).astype(jnp.float32)

    if t_frames.shape[1] not in (2, n):
        # The ONLY tolerated mismatch is the reference continuation-pack
        # off-by-one ([B, N+1], ``video_readers.py:101``): the first N
        # entries pair with the N frames. Anything else is a caller bug —
        # silently truncating would compute garbage delta_time/Tr.
        if t_frames.shape[1] != n + 1:
            raise ValueError(
                f"t_frames has {t_frames.shape[1]} entries for {n} frames; "
                "expected 2 (endpoints), N, or N+1 (reference "
                "continuation-pack layout, video_readers.py:101)"
            )
        t_frames = t_frames[:, :n]
    t_float = _per_row_times(t_frames, n)  # [B, N]

    duration = (cfg.num_bins - 1) / (n - 1)
    time_frames = duration * jnp.arange(n, dtype=jnp.float32)

    frames_rescaled = rescale_intensity_frame(frames)
    frames_log = lin_log(frames)

    if state is None:
        assert key is not None, "key required to initialize emulator state"
        state = emulator_init(key, cfg, frames_log[:, 0], tr_frames, t_float[:, 0])
    else:
        # pack-boundary rebase of last-spike times (reference :329-330)
        mem = state.timestamp_mem
        mem = jnp.where(mem > 0, mem - (cfg.num_bins - 1), mem)
        mem = jnp.where(mem < 0, -tr_frames, mem)
        state = state._replace(timestamp_mem=mem)

    # uniform per-row [B] t_previous (states built by hand/tests may carry
    # the scalar form; the pair scan requires a stable carry shape)
    state = state._replace(
        t_previous=jnp.broadcast_to(
            jnp.asarray(state.t_previous, jnp.float32), (b,)
        )
    )

    # --- IIR temporal filtering over the pack (reference :252-275) ---------
    dts = (t_float[:, 1:] - t_float[:, :-1]).T  # [N-1, B]
    if cfg.cutoff_hz > 0:
        def lp_body(lp, inp):
            frame_log_n, inten_n, dt = inp
            lp = low_pass_filter_step(
                frame_log_n, lp, inten_n, dt[:, None, None], cfg.cutoff_hz,
                ql=cfg.ql, qs=cfg.qs,
            )
            return lp, lp

        lp_final, filtered = jax.lax.scan(
            lp_body,
            state.lp_log_frame,
            (
                jnp.moveaxis(frames_log[:, 1:], 1, 0),
                jnp.moveaxis(frames_rescaled[:, 1:], 1, 0),
                dts,
            ),
            unroll=cfg.unroll_pairs,
        )
        state = state._replace(lp_log_frame=lp_final)
    else:
        filtered = jnp.moveaxis(frames_log[:, 1:], 1, 0)  # [N-1, B, H, W]

    scan_inputs = (
        filtered,
        jnp.moveaxis(frames_rescaled[:, 1:], 1, 0),
        t_float[:, 1:].T,  # [N-1, B]
        time_frames[:-1],  # [N-1]
    )
    consts = dict(duration=duration, tr=tr, tr_frames=tr_frames, b=b, h=h, w=w)
    return state, scan_inputs, consts


class EmulatorStats(NamedTuple):
    """Per-pack diagnostics (see ``emulate_pack(with_stats=True)``)."""

    num_events: jax.Array  # scalar int32
    max_event_count: jax.Array  # scalar int32, BEFORE the max_iters clip
    clipped_pixels: jax.Array  # scalar int32: pixels whose count hit the clip


def emulate_pack(
    cfg: EmulatorConfig,
    state: EmulatorState | None,
    frames: jax.Array,
    t_frames: jax.Array,
    key: jax.Array | None = None,
    with_stats: bool = False,
):
    """Emulate events for one pack of consecutive frames.

    Args:
      state: previous ``EmulatorState`` or ``None`` at a sequence start
        (reference ``reset()`` + ``_init`` on first pack).
      frames: ``[B, N, H, W]`` intensity frames in 0-255 (N >= 2).
      t_frames: ``[B, 2]`` (endpoints; interior linearly spaced) or ``[B, N]``
        timestamps in seconds. If given ``[B, N+1]`` (the reference
        continuation-pack off-by-one, ``video_readers.py:101``), the first N
        entries are used, matching the reference pairing.
      key: PRNG key (required when ``state is None``).
      with_stats: when True the second return value is an ``EmulatorStats``
        (includes the pre-clip max event count, so saturation against
        ``cfg.max_iters`` is detectable) instead of the bare event count.

    Returns ``(voxel [B, H, W, num_bins] normalized, num_events | stats,
    new_state)``.
    """
    state, scan_inputs, consts = _prepare_pack(cfg, state, frames, t_frames, key)
    pair_step = _make_pair_step(cfg, state, consts, collect=False)

    carry0 = (state.base_log_frame, state.timestamp_mem, state.t_previous, state.key)
    (base, timestamp_mem, t_prev, key), (voxels, n_evs, max_cnt, clipped) = (
        jax.lax.scan(pair_step, carry0, scan_inputs, unroll=cfg.unroll_pairs)
    )

    voxel = jnp.sum(voxels, axis=0)
    num_events = jnp.sum(n_evs)

    voxel = event_preprocess(
        jnp.moveaxis(voxel, -1, 1), mode="std", filter_hot_pixel=False
    )
    voxel = jnp.moveaxis(voxel, 1, -1)  # back to [B,H,W,nb]

    new_state = state._replace(
        base_log_frame=base,
        timestamp_mem=timestamp_mem,
        t_previous=t_prev,
        key=key,
    )
    second = (
        EmulatorStats(num_events, jnp.max(max_cnt), jnp.sum(clipped))
        if with_stats
        else num_events
    )
    return (
        jax.lax.stop_gradient(voxel),
        second,
        jax.tree_util.tree_map(jax.lax.stop_gradient, new_state),
    )


def _make_pair_step(cfg: EmulatorConfig, state: EmulatorState, consts, collect: bool):
    """Build the per-frame-pair scan body (reference hot loop :362-522).

    ``collect=False`` outputs ``(voxel_add, n_ev, max_cnt, clipped)`` per
    pair; ``collect=True`` outputs dense ``(masks [I,B,H,W], ts_all [I,B],
    pol, n_ev)`` records for raw-event extraction.
    """
    duration = consts["duration"]
    tr, tr_frames = consts["tr"], consts["tr_frames"]
    b, h, w = consts["b"], consts["h"], consts["w"]
    pos_thres, neg_thres = state.pos_thres, state.neg_thres
    pos_pre, neg_pre = state.pos_thres_pre_prob, state.neg_thres_pre_prob
    noise_rate = state.noise_rate_array

    # NOTE: the reference updates base with final_evts_frame (events actually
    # emitted, including shot-noise extras and refractory suppressions). To
    # keep that exact, fold the base update into the scan carry.
    #
    # Vectorized-over-iterations design: candidate masks for ALL max_iters
    # iterations are computed in one fused pass (including a single batched
    # shot-noise draw instead of one threefry per iteration), the
    # bilinear-in-time accumulation is one einsum contraction over the
    # iteration axis (MXU), and only the refractory last-spike recurrence —
    # the one true sequential dependency — remains a loop, touching 3 cheap
    # elementwise ops per iteration. With refractory off there is NO
    # sequential work at all.
    def pair_step(carry, inputs):
        base, timestamp_mem, t_prev, key = carry
        new_frame, inten01, t_n, tf_base = inputs

        delta_time = (t_n - t_prev)[:, None, None]  # [B,1,1], per batch row
        if cfg.leak_rate_hz > 0:
            key, k_leak = jax.random.split(key)
            base = subtract_leak_current(
                k_leak, base, cfg.leak_rate_hz, delta_time, pos_thres,
                cfg.leak_jitter_fraction, noise_rate,
            )

        diff = new_frame - base
        diff = jnp.where(jnp.abs(diff) > 1e-6, diff, 0.0)
        pol = jnp.sign(diff)
        c = jnp.where(pol > 0, pos_thres, 0.0) + jnp.where(pol < 0, neg_thres, 0.0)
        event_counts = jnp.floor(jnp.abs(diff) / (c + 1e-9)).astype(jnp.int32)
        max_cnt = jnp.max(event_counts)  # pre-clip, for saturation stats
        clipped = jnp.sum(event_counts > cfg.max_iters, dtype=jnp.int32)
        num_iters = jnp.clip(jnp.max(event_counts, axis=(1, 2)), 1, cfg.max_iters)
        ts_step = duration / num_iters.astype(jnp.float32)  # [B]
        n_iter_max = jnp.max(num_iters)

        n_i = cfg.max_iters

        use_pallas = not collect and (
            cfg.iters_impl == "pallas"
            or (
                cfg.iters_impl == "auto"
                and cfg.refractory_period_s > 0
                and jax.default_backend() == "tpu"
                and h * w <= 64 * 1024
            )
        )
        on_tpu = jax.default_backend() == "tpu"

        # shot-noise probabilities + ONE batched draw (loop-independent,
        # reference :161-207); the compiled pallas path generates randoms
        # with the in-kernel hardware PRNG instead (XLA-side generation
        # costs ~26 ms/pack on this platform — BENCH_NOTES.md)
        if cfg.shot_noise_rate_hz > 0:
            shot_factor = (
                (cfg.shot_noise_rate_hz / 2.0)
                * delta_time
                / num_iters.astype(jnp.float32)[:, None, None]
            ) * ((cfg.shot_noise_inten_factor - 1.0) * inten01 + 1.0)
            one_minus_on_prob = 1.0 - shot_factor * pos_pre
            off_prob = shot_factor * neg_pre
            if not (use_pallas and on_tpu):
                key, k_shot = jax.random.split(key)
                rand01 = jax.random.uniform(k_shot, (n_i, b, h, w))  # one draw
            else:
                rand01 = None
        else:
            one_minus_on_prob = off_prob = rand01 = None
        if use_pallas:
            # fused iteration loop in VMEM (ops/pallas/emulator_iters.py):
            # ~1 ms/pair vs ~3 ms for the XLA scan on the refractory path
            from ..ops.pallas.emulator_iters import emulator_iters_pallas

            shot = cfg.shot_noise_rate_hz > 0
            interpret = not on_tpu
            # interpret path keeps the XLA draw for exact cross-impl tests
            internal = shot and not interpret
            if not shot:
                one_minus_on_prob = off_prob = jnp.zeros((b, h, w), jnp.float32)
            if internal or not shot:
                rand01 = jnp.zeros((1, b, 1, 1), jnp.float32)  # unused dummy
            if internal:
                key, k_seed = jax.random.split(key)
                seed = jax.random.bits(k_seed, (b,), jnp.uint32).astype(jnp.int32)
            else:
                seed = jnp.zeros((b,), jnp.int32)
            voxel_add, timestamp_mem, final_evts = emulator_iters_pallas(
                event_counts, pol, timestamp_mem, tr_frames,
                one_minus_on_prob, off_prob, rand01, seed,
                ts_step, num_iters, tr > ts_step, tf_base,
                num_bins=cfg.num_bins, max_iters=n_i, shot=shot,
                interpret=interpret, internal_rng=internal,
            )
            n_ev = jnp.sum(final_evts, dtype=jnp.int32)
            base = base + pol * final_evts.astype(jnp.float32) * c
            return (base, timestamp_mem, t_n, key), (voxel_add, n_ev, max_cnt, clipped)

        iters = jnp.arange(n_i, dtype=jnp.int32)  # [I]
        # candidate events: prefix-of-iterations property (count >= i+1)
        cand = event_counts[None] >= (iters[:, None, None, None] + 1)  # [I,B,H,W]
        cand = cand & (iters[:, None, None, None] < n_iter_max)

        if cfg.shot_noise_rate_hz > 0:
            shot = jnp.where(pol[None] > 0, rand01 > one_minus_on_prob[None], False)
            shot = shot | jnp.where(pol[None] < 0, rand01 < off_prob[None], False)
            active = iters[:, None] < num_iters[None, :]  # [I,B]
            cand = cand | (shot & active[:, :, None, None])

        # event times per (iteration, batch), zero beyond num_iters
        ts_all = jnp.where(
            iters[:, None] < num_iters[None, :],
            tf_base + ts_step[None, :] * (iters[:, None] + 1.0),
            0.0,
        )  # [I,B]

        if cfg.refractory_period_s > 0:
            # the last-spike recurrence is the one sequential dependency;
            # scan over iterations with stacked mask outputs (cheap body:
            # compare + two selects per step). The barrier keeps the
            # candidate/timestamp computation out of the scan body.
            cand, ts_all = jax.lax.optimization_barrier((cand, ts_all))
            gate = (tr > ts_step)[:, None, None]  # [B,1,1]

            def refr_body(mem, inp):
                cand_i, ts_i = inp
                ts_map = jnp.broadcast_to(ts_i[:, None, None], (b, h, w))
                m = cand_i & jnp.where(gate, (ts_map - mem) > tr_frames, True)
                mem = jnp.where(m & gate, ts_map, mem)
                return mem, m

            timestamp_mem, masks = jax.lax.scan(
                refr_body, timestamp_mem, (cand, ts_all), unroll=cfg.unroll_iters
            )
        else:
            masks = cand

        final_evts = jnp.sum(masks, axis=0, dtype=jnp.int32)  # [B,H,W]
        n_ev = jnp.sum(final_evts, dtype=jnp.int32)

        # memorized value moves by the emitted events (reference :522)
        base = base + pol * final_evts.astype(jnp.float32) * c
        carry = (base, timestamp_mem, t_n, key)

        if collect:
            return carry, (masks, ts_all, pol, n_ev)

        # bilinear-in-time accumulation over the iteration axis. The fast
        # formulation depends on where `masks` comes from (XLA layout
        # lottery, measured on v5e): einsum is fast on scan-produced masks
        # (2.5 ms/pack) but pathological on fused candidate masks
        # (28 ms/pack); per-bin leading-axis reductions are the exact
        # mirror image. Select per path.
        bins = jnp.arange(cfg.num_bins, dtype=jnp.float32)
        wgt = jnp.maximum(0.0, 1.0 - jnp.abs(ts_all[..., None] - bins))  # [I,B,nb]
        evmap = pol[None] * masks  # [I,B,H,W]
        voxel_add = jnp.stack(
            [
                jnp.sum(evmap * wgt[:, :, None, None, k], axis=0)
                for k in range(cfg.num_bins)
            ],
            axis=-1,
        )
        return carry, (voxel_add, n_ev, max_cnt, clipped)

    return pair_step


def emulate_pack_raw(
    cfg: EmulatorConfig,
    state: EmulatorState | None,
    frames: jax.Array,
    t_frames: jax.Array,
    key: jax.Array | None = None,
):
    """Raw-event output mode (reference ``output_mode='raw'``, :504-534).

    Returns ``(events [K, 5] numpy, num_events, new_state)`` where rows are
    ``[t, x, y, p, batch]`` sorted by timestamp then batch, with ``t`` in
    voxel-bin units exactly like the reference. The device side produces
    dense per-iteration masks/timestamps (static ``cfg.max_iters`` bound);
    event extraction happens on host — raw mode is the offline V2E-generation
    path, not a training hot loop.
    """
    import numpy as np

    voxel_out, masks, ts_iter, pols, num_events, new_state = _emulate_pack_dense(
        cfg, state, frames, t_frames, key
    )
    # masks: [P, I, B, H, W] bool; ts_iter: [P, I, B]; pols: [P, B, H, W]
    masks = np.asarray(masks)
    ts_iter = np.asarray(ts_iter)
    pols = np.asarray(pols)

    p_idx, i_idx, b_idx, y_idx, x_idx = np.nonzero(masks)
    t_vals = ts_iter[p_idx, i_idx, b_idx]
    p_vals = pols[p_idx, b_idx, y_idx, x_idx]
    events = np.stack(
        [t_vals, x_idx.astype(np.float64), y_idx.astype(np.float64),
         p_vals, b_idx.astype(np.float64)], axis=1,
    )
    # reference sorts by timestamp, then (stable) by batch (:528-534)
    events = events[np.argsort(events[:, 0], kind="stable")]
    events = events[np.argsort(events[:, -1], kind="stable")]
    return events, int(num_events), new_state


def _emulate_pack_dense(cfg, state, frames, t_frames, key):
    """Pack emulation returning dense per-iteration event records.

    Thin wrapper over the shared ``_prepare_pack`` + ``_make_pair_step``
    (``collect=True``) — identical math to ``emulate_pack``, with stacked
    ``(masks [P,I,B,H,W], ts [P,I,B], pol [P,B,H,W])`` outputs for raw-event
    extraction.
    """
    state, scan_inputs, consts = _prepare_pack(cfg, state, frames, t_frames, key)
    pair_step = _make_pair_step(cfg, state, consts, collect=True)

    carry0 = (state.base_log_frame, state.timestamp_mem, state.t_previous, state.key)
    (base, timestamp_mem, t_prev, key), (masks, ts_iters, pols, n_evs) = jax.lax.scan(
        pair_step, carry0, scan_inputs
    )
    new_state = state._replace(
        base_log_frame=base, timestamp_mem=timestamp_mem, t_previous=t_prev, key=key
    )
    return None, masks, ts_iters, pols, jnp.sum(n_evs), new_state
