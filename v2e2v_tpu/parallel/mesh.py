"""Mesh construction and pjit-sharded training steps.

TPU-first scaling design (no reference analog — the torch repo is single-GPU,
``train.py:2-13``):

- mesh axes ``("data", "spatial")``: sequences are embarrassingly parallel
  along ``data`` (the recurrence is serial in time, parallel across
  sequences); ``spatial`` shards the image width across chips for the
  fully-convolutional nets — XLA inserts halo exchanges for the 3x3 convs
  and a final ``psum`` for the gradient all-reduce over both axes.
- parameters are replicated; batches are sharded ``P(None, "data", None,
  "spatial", None)`` for ``[T, B, H, W, C]`` sequences.
- everything goes through ``jax.jit`` with ``NamedSharding`` annotations; no
  hand-written collectives are needed for data/spatial parallel training.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.cista import CistaConfig, cista_sequence
from ..training.losses import many_to_one_loss


def make_mesh(n_data: int | None = None, n_spatial: int = 1, devices=None) -> Mesh:
    """Build a ``(data, spatial)`` mesh.

    Defaults to all available devices on the data axis. Pass
    ``devices=jax.devices("cpu")`` for virtual-device testing.
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_spatial
    devices = np.asarray(devices[: n_data * n_spatial]).reshape(n_data, n_spatial)
    return Mesh(devices, ("data", "spatial"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, time_leading: bool = True) -> NamedSharding:
    """Sharding for ``[T, B, H, W, C]`` (or ``[B, H, W, C]``) arrays."""
    if time_leading:
        return NamedSharding(mesh, P(None, "data", None, "spatial", None))
    return NamedSharding(mesh, P("data", None, "spatial", None))


def make_e2v_train_step(
    cfg: CistaConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    lpips_fn=None,
):
    """Build a pjit-compiled many-to-one E2V training step.

    The recurrence over ``len_sequence`` reconstructions is a ``lax.scan``
    (the BPTT window of ``train_e2v.py:108-115``); loss is computed on the
    final reconstruction only, matching the reference's many-to-one strategy.

    Step signature: ``(params, opt_state, voxel_seq [T,B,H,W,nb],
    gt [B,H,W,1]) -> (params, opt_state, loss)``.
    """
    rep = replicated(mesh)
    seq_shard = batch_sharding(mesh, time_leading=True)
    gt_shard = batch_sharding(mesh, time_leading=False)

    def loss_fn(params, voxel_seq, gt):
        # remat: BPTT over len_sequence=15 at 180x240 b=8 fp32 otherwise
        # overflows 16G HBM (every conv activation of every step kept live)
        recs, _ = cista_sequence(params, cfg, voxel_seq, remat=True)
        return many_to_one_loss(recs[-1], gt, lpips_fn=lpips_fn)

    def step(params, opt_state, voxel_seq, gt):
        loss, grads = jax.value_and_grad(loss_fn)(params, voxel_seq, gt)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(rep, rep, seq_shard, gt_shard),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),
    )


def make_e2v_train_step_device_data(
    cfg: CistaConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    lpips_fn=None,
    noise_std: float = 0.0,
):
    """E2V training step over a DEVICE-RESIDENT dataset.

    Motivation: on the tunneled TPU platform every host->device transfer
    leaks its full byte size in host RAM (measured ~100 MB per 104 MB batch,
    never reclaimed — a 60-epoch reference-recipe run leaks >300 GB and is
    OOM-killed). With the dataset uploaded ONCE as ``data [N,T,H,W,nb]`` /
    ``gt_all [N,H,W,1]`` and batches gathered on-device by index, the only
    recurring transfer is the ``idx [B]`` array (bytes). See BENCH_NOTES.md.

    ``noise_std > 0`` adds the reference's voxel noise augmentation
    (``--add_noise``) on-device from ``key`` instead of on host.

    Step signature: ``(params, opt_state, data, gt_all, idx [B], key)
    -> (params, opt_state, loss)``. ``data``/``gt_all`` may be bf16 to halve
    HBM (inputs are cast to f32 for the step).
    """
    rep = replicated(mesh)
    seq_shard = batch_sharding(mesh, time_leading=True)
    gt_shard = batch_sharding(mesh, time_leading=False)
    # the device-resident dataset shards along the SAMPLE axis over the data
    # mesh axis (HBM cost per device = dataset/n_data, not the full dataset);
    # the gather-by-replicated-idx below crosses shards via XLA collectives
    ds_shard = NamedSharding(mesh, P("data"))

    def loss_fn(params, voxel_seq, gt, w):
        recs, _ = cista_sequence(params, cfg, voxel_seq, remat=True)
        return many_to_one_loss(recs[-1], gt, lpips_fn=lpips_fn, sample_weights=w)

    def step(params, opt_state, data, gt_all, idx, key, w):
        # w [B]: 1.0 real / 0.0 padding — the final partial batch pads idx to
        # the static batch shape and masks the loss, so NO samples are
        # dropped and full batches (w=ones) keep the exact plain-mean loss
        voxel_seq = jnp.moveaxis(
            jnp.take(data, idx, axis=0), 1, 0
        ).astype(jnp.float32)
        gt = jnp.take(gt_all, idx, axis=0).astype(jnp.float32)
        if noise_std > 0.0:
            voxel_seq = voxel_seq + noise_std * jax.random.normal(
                key, voxel_seq.shape, jnp.float32
            )
        voxel_seq = jax.lax.with_sharding_constraint(voxel_seq, seq_shard)
        gt = jax.lax.with_sharding_constraint(gt, gt_shard)
        loss, grads = jax.value_and_grad(loss_fn)(params, voxel_seq, gt, w)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(rep, rep, ds_shard, ds_shard, rep, rep, rep),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),
    )


def make_v2e2v_train_step_device_data(
    cfg,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    lpips_fn=None,
    clamp: tuple[float, float] = (1e-7, 1.0 - 1e-7),
):
    """V2E2V training step over a DEVICE-RESIDENT dataset.

    Same motivation as ``make_e2v_train_step_device_data`` (the platform's
    per-transfer host-RAM leak): the whole uniform-shape training set
    uploads ONCE as ``frames_u8 [S, T, N, H, W] uint8`` (8x smaller than
    the f32 per-batch transfers) + ``ts_all [S, T, N] float32``, sharded
    along the sample axis; per step only ``idx [B]`` and a key transfer.
    Ground truth is derived on-device (last frame / 255, exactly
    ``TrainSeqData._emit``), so no separate gt upload exists.

    Step signature: ``(params, opt_state, frames_u8, ts_all, idx, key,
    w [B]) -> (params, opt_state, loss, stats)`` with the same ``stats``
    dict as ``make_v2e2v_train_step``; ``w`` is 1.0 for real samples and
    0.0 for tail-batch padding (loss-masked, so no samples are dropped).
    """
    from ..models.v2e2v import v2e2v_sequence
    from ..training.losses import many_to_one_loss

    rep = replicated(mesh)
    ds_shard = NamedSharding(mesh, P("data"))
    frames_shard = NamedSharding(mesh, P(None, "data", None, None, None))
    ts_shard = NamedSharding(mesh, P(None, "data", None))

    def loss_fn(params, frames_seq, ts_seq, gt, key, w):
        recs, _, st = v2e2v_sequence(
            params, cfg, frames_seq, ts_seq, key, with_stats=True, remat=True
        )
        rec = jnp.clip(recs[-1], clamp[0], clamp[1])
        loss = many_to_one_loss(rec, gt, lpips_fn=lpips_fn, sample_weights=w)
        aux = {
            "num_events": jnp.sum(st["num_events"]),
            "max_event_count": jnp.max(st["max_event_count"]),
            "clipped_pixels": jnp.sum(st["clipped_pixels"]),
        }
        return loss, aux

    def step(params, opt_state, frames_u8, ts_all, idx, key, w):
        # w [B]: 1.0 real / 0.0 padding — masked tail batch, no data dropped
        frames_seq = jnp.moveaxis(
            jnp.take(frames_u8, idx, axis=0), 1, 0
        ).astype(jnp.float32)  # [T, B, N, H, W]
        ts_seq = jnp.moveaxis(jnp.take(ts_all, idx, axis=0), 1, 0)
        gt = frames_seq[-1][:, -1, :, :, None] / 255.0  # TrainSeqData._emit
        frames_seq = jax.lax.with_sharding_constraint(frames_seq, frames_shard)
        ts_seq = jax.lax.with_sharding_constraint(ts_seq, ts_shard)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, frames_seq, ts_seq, gt, key, w
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return jax.jit(
        step,
        in_shardings=(rep, rep, ds_shard, ds_shard, rep, rep, rep),
        out_shardings=(rep, rep, rep, rep),
        donate_argnums=(0, 1),
    )


def make_v2e2v_train_step(
    cfg,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    lpips_fn=None,
    clamp: tuple[float, float] = (1e-7, 1.0 - 1e-7),
    monitor: bool = False,
):
    """pjit-compiled V2E2V many-to-one training step.

    The whole BPTT window — emulator packs + reconstructions — is ONE
    ``lax.scan`` inside one jitted update (reference ``train.py:102-161``
    semantics: loss on the final reconstruction, output clamped), so
    trace/compile cost is constant in ``len_sequence``. Frames/timestamps
    are sharded on the ``data`` axis; spatial sharding is intentionally NOT
    applied to the emulator (its per-batch reductions are cheap; convs
    dominate).

    Step signature: ``(params, opt_state, frames_seq [T,B,N,H,W],
    ts_seq [T,B,N], gt [B,H,W,1], key) -> (params, opt_state, loss, stats)``.
    ``stats`` is a dict of window-level emulator scalars —
    ``num_events`` (sum), ``max_event_count`` (max, PRE-clip) and
    ``clipped_pixels`` (sum) — so callers can detect when ``cfg.emulator
    .max_iters`` statically clips the reference's unbounded per-pixel event
    loop (``v2e/v2e_model.py:449``) instead of silently under-emitting.
    With ``monitor=True`` the dict additionally carries ``{rec, voxel}``
    (last pack) — feeds the ``--display_train`` panels.
    """
    from ..models.v2e2v import v2e2v_sequence
    from ..training.losses import many_to_one_loss

    rep = replicated(mesh)
    frames_shard = NamedSharding(mesh, P(None, "data", None, None, None))
    ts_shard = NamedSharding(mesh, P(None, "data", None))
    gt_shard = NamedSharding(mesh, P("data", None, None, None))

    def loss_fn(params, frames_seq, ts_seq, gt, key):
        if monitor:
            recs, _, (voxels, st) = v2e2v_sequence(
                params, cfg, frames_seq, ts_seq, key, with_monitor=True, remat=True
            )
        else:
            recs, _, st = v2e2v_sequence(
                params, cfg, frames_seq, ts_seq, key, with_stats=True, remat=True
            )
        rec = jnp.clip(recs[-1], clamp[0], clamp[1])
        loss = many_to_one_loss(rec, gt, lpips_fn=lpips_fn)
        aux = {
            "num_events": jnp.sum(st["num_events"]),
            "max_event_count": jnp.max(st["max_event_count"]),
            "clipped_pixels": jnp.sum(st["clipped_pixels"]),
        }
        if monitor:
            aux.update({"rec": rec, "voxel": voxels[-1]})
        return loss, aux

    def step(params, opt_state, frames_seq, ts_seq, gt, key):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, frames_seq, ts_seq, gt, key
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return jax.jit(
        step,
        in_shardings=(rep, rep, frames_shard, ts_shard, gt_shard, rep),
        out_shardings=(rep, rep, rep, rep),
        donate_argnums=(0, 1),
    )
