#!/usr/bin/env python
"""V2E2V training CLI — reference-compatible flags.

Mirrors reference ``train.py`` (lsying009/V2E2V): events are generated on the
fly by the emulator from HFR frame packs; the E2V net is trained many-to-one
over length-``len_sequence`` windows with output clamped to
``(1e-7, 1-1e-7)``; fresh runs warm-start the E2V weights from
``--path_to_e2v``; checkpoints embed ``v2e_params`` so inference can rebuild
the emulator config (:94-98).

TPU design: the whole BPTT window (emulator packs + reconstructions) traces
into ONE jitted update; the emulator contributes no gradient (it has no
trainable parameters) so reverse-mode only walks the reconstruction chain.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


class Train:
    def __init__(self, cfgs):
        import jax
        import jax.numpy as jnp
        import optax

        from v2e2v_tpu.data.datasets import TrainSeqData
        from v2e2v_tpu.models.cista import init_cista_lstc
        from v2e2v_tpu.models.v2e2v import V2E2VConfig
        from v2e2v_tpu.training.lpips_jax import make_lpips_fn
        from v2e2v_tpu.utils.checkpoint import (
            load_checkpoint,
            load_torch_checkpoint,
            save_checkpoint,
            v2e2v_checkpoint_name,
        )

        self.cfgs = cfgs
        self.model_name = v2e2v_checkpoint_name(cfgs)
        self.path_to_model = os.path.join(cfgs.path_to_model, self.model_name)
        os.makedirs(self.path_to_model, exist_ok=True)

        self.cfg = V2E2VConfig.from_flags(cfgs)
        self.v2e_params = {
            "C": cfgs.C,
            "ps": cfgs.ps,
            "pl": cfgs.pl,
            "cutoff_hz": cfgs.cutoff_hz,
            "qs": cfgs.qs,
            "ql": cfgs.ql,
            "refractory_period_s": cfgs.refractory_period_s,
        }

        resume_payload = None
        if cfgs.load_epoch_for_train:
            resume_payload = load_checkpoint(
                os.path.join(
                    self.path_to_model,
                    f"{self.model_name}_{cfgs.load_epoch_for_train}",
                )
            )
            self.params = resume_payload["params"]
        elif cfgs.path_to_e2v:
            if cfgs.path_to_e2v.endswith((".pth.tar", ".pth", ".pt")):
                self.params, _, _ = load_torch_checkpoint(cfgs.path_to_e2v, "cista-lstc")
            else:
                self.params = load_checkpoint(cfgs.path_to_e2v)["params"]
        else:
            self.params = init_cista_lstc(jax.random.PRNGKey(cfgs.seed), self.cfg.cista)

        self.train_data = TrainSeqData(
            os.path.join(cfgs.path_to_train_data, "train_v2e2v.txt"),
            cfgs.path_to_train_data,
            cfgs.len_sequence,
            cfgs.num_pack_frames,
            drop_seq_tails=getattr(cfgs, "drop_seq_tails", False),
            cache_samples=getattr(cfgs, "cache_samples", False),
        )
        print(f"training sequences: {len(self.train_data)}")

        base_lr = cfgs.lr
        self.lr_for_epoch = lambda e: base_lr * (0.9 ** np.floor(e / 10.0))
        self.tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=self.lr_for_epoch(cfgs.load_epoch_for_train)
        )
        self.opt_state = self.tx.init(self.params)
        if resume_payload is not None:
            from v2e2v_tpu.utils.checkpoint import restore_opt_state

            self.opt_state = restore_opt_state(
                self.opt_state, resume_payload.get("opt_state")
            )
        # multi-host: only process 0 writes checkpoints (all processes
        # hold replicated params; a shared filesystem would race)
        def _gated_save(path, payload, _jax=jax):
            if _jax.process_index() == 0:
                save_checkpoint(path, payload)

        self._save_checkpoint = _gated_save
        # TPU-friendly RNG for the emulator's noise streams (see --rng_impl)
        self._noise_key = jax.random.key(cfgs.seed, impl=cfgs.rng_impl)

        lpips_fn = make_lpips_fn()
        if lpips_fn is None:
            print("LPIPS weights unavailable; training with L1 + (1 - SSIM) only")

        from v2e2v_tpu.parallel.mesh import make_mesh, make_v2e2v_train_step

        # data-axis size must divide the batch; default to gcd(batch, devices)
        import math as _math

        n_data = (
            cfgs.mesh_data
            if cfgs.mesh_data > 0
            else _math.gcd(cfgs.batch_size, len(jax.devices()))
        )
        self.mesh = make_mesh(n_data, 1)
        if getattr(cfgs, "device_data", "off") != "off":
            from v2e2v_tpu.parallel.mesh import make_v2e2v_train_step_device_data

            if not getattr(cfgs, "drop_seq_tails", False):
                raise SystemExit("--device_data requires --drop_seq_tails "
                                 "(uniform [T, ...] sample shapes)")
            if cfgs.display_train:
                raise SystemExit("--device_data does not support "
                                 "--display_train (no per-pack voxels on host)")
            self.train_step = make_v2e2v_train_step_device_data(
                self.cfg, self.tx, self.mesh, lpips_fn=lpips_fn
            )
        else:
            self.train_step = make_v2e2v_train_step(
                self.cfg, self.tx, self.mesh, lpips_fn=lpips_fn,
                monitor=cfgs.display_train,
            )
        # --display_train: headless stand-in for the reference's matplotlib
        # previews (model_v2e2v.py:110-126 / train.py:140-152) — composite
        # PNG panels every 50 batches
        self.display = None
        if cfgs.display_train:
            from v2e2v_tpu.utils.data_io import DebugPanelWriter

            self.display = DebugPanelWriter(cfgs, self.model_name, "train")

    def _upload_dataset(self):
        """--device_data: one-time upload of the whole uniform-shape training
        set to device HBM. Frames stay uint8 (8x smaller than the recurring
        f32 per-batch transfers that leak host RAM — BENCH_NOTES.md);
        timestamps upload as float32 (the emulator computes in f32 anyway).
        Ground truth derives on-device from the last frame."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec

        ds = self.train_data
        seq_ts, seq_frames = [], []
        for i in range(len(ds)):
            ts, images_u8 = ds._load_cacheable(i)
            seq_ts.append(ts.astype(np.float32))
            seq_frames.append(images_u8)
        frames = np.stack(seq_frames, 0)  # [S, T, N, H, W] uint8
        ts_all = np.stack(seq_ts, 0)  # [S, T, N] f32
        print(f"uploading dataset to device: {frames.shape} uint8 "
              f"({frames.nbytes / 2**30:.1f} GiB)")
        ds_shard = NamedSharding(self.mesh, PartitionSpec("data"))
        frames_dev = jax.device_put(frames, ds_shard)
        ts_dev = jax.device_put(ts_all, ds_shard)
        frames_dev.block_until_ready()
        return frames_dev, ts_dev

    def _run_device_data(self, logger):
        """Training loop over the device-resident dataset: per step the host
        sends ONLY an index array and a PRNG key — no per-batch H2D."""
        import jax
        import jax.numpy as jnp

        cfgs = self.cfgs
        frames_dev, ts_dev = self._upload_dataset()
        n = len(self.train_data)
        bsz = cfgs.batch_size
        if n % bsz:
            print(f"note: final {n % bsz}-sample batch each epoch is padded "
                  f"to batch_size and loss-masked (n={n}, batch_size={bsz})")
        sat_clipped = 0
        sat_max_count = 0
        for epoch in range(cfgs.load_epoch_for_train, cfgs.epochs):
            lr = float(self.lr_for_epoch(epoch))
            self.opt_state.hyperparams["learning_rate"] = np.asarray(lr, np.float32)
            print(f"lr: {lr}")
            t_epoch = time.time()
            order = np.arange(n)
            if cfgs.shuffle:
                np.random.default_rng(cfgs.seed + epoch).shuffle(order)
            n_batches = 0
            epoch_loss_sum = 0.0
            for start in range(0, n, bsz):
                chunk = order[start : start + bsz].astype(np.int32)
                w = np.ones(bsz, np.float32)
                if len(chunk) < bsz:  # padded + masked tail batch
                    w[len(chunk):] = 0.0
                    chunk = np.concatenate(
                        [chunk, np.full(bsz - len(chunk), chunk[0], np.int32)]
                    )
                idx = jnp.asarray(chunk)
                # (epoch, batch) noise key — resume continues the stream
                key = jax.random.fold_in(
                    jax.random.fold_in(self._noise_key, epoch), n_batches
                )
                self.params, self.opt_state, loss, aux = self.train_step(
                    self.params, self.opt_state, frames_dev, ts_dev, idx, key,
                    jnp.asarray(w),
                )
                clip_now = int(aux["clipped_pixels"])
                if clip_now:
                    sat_clipped += clip_now
                    sat_max_count = max(sat_max_count, int(aux["max_event_count"]))
                loss = float(loss)
                epoch_loss_sum += loss
                if n_batches % 50 == 0:
                    print(
                        f"Train Epoch: {epoch + 1} [{n_batches * bsz}/{n}]"
                        f"\tloss: {loss:.6f}"
                    )
                    logger.scalar("loss", loss, epoch * ((n // bsz) or 1) + n_batches)
                n_batches += 1

            mean_loss = epoch_loss_sum / max(n_batches, 1)
            print(
                f"epoch {epoch + 1} done in {time.time() - t_epoch:.1f}s, "
                f"mean loss {mean_loss:.5f}"
            )
            if sat_clipped:
                print(
                    f"warning: emulator saturated on {sat_clipped} pixel-pairs "
                    f"this epoch — observed max per-pixel event count "
                    f"{sat_max_count} exceeds max_iters="
                    f"{self.cfg.emulator.max_iters}; raise --v2e_max_iters"
                )
                logger.scalar("emulator_clipped_pixels", sat_clipped, epoch)
                sat_clipped = 0
                sat_max_count = 0
            logger.scalar("epoch_mean_loss", mean_loss, epoch)
            self._save_checkpoint(
                os.path.join(self.path_to_model, f"{self.model_name}_{epoch + 1}"),
                {
                    "epoch": epoch + 1,
                    "params": self.params,
                    "opt_state": self.opt_state,
                    "v2e_params": self.v2e_params,
                },
            )
        logger.close()

    def run(self):
        import jax

        from v2e2v_tpu.data.datasets import SampleLoader, iterate_batches
        from v2e2v_tpu.utils.logging import ScalarLogger

        cfgs = self.cfgs
        logger = ScalarLogger(
            os.path.join("summary", self.model_name), enabled=cfgs.is_SummaryWriter
        )
        if getattr(cfgs, "device_data", "off") != "off":
            self._run_device_data(logger)
            return
        # persistent spawn-worker pool, reused across epochs
        loader = (
            SampleLoader(self.train_data, cfgs.num_workers)
            if getattr(cfgs, "num_workers", 0) > 0
            else None
        )

        step_idx = 0
        dropped_batches = 0
        sat_clipped = 0
        sat_max_count = 0
        for epoch in range(cfgs.load_epoch_for_train, cfgs.epochs):
            lr = float(self.lr_for_epoch(epoch))
            self.opt_state.hyperparams["learning_rate"] = np.asarray(lr, np.float32)
            print(f"lr: {lr}")
            t_epoch = time.time()
            epoch_loss_sum = 0.0
            for n_batches, batch in enumerate(
                iterate_batches(
                    self.train_data, cfgs.batch_size, cfgs.shuffle,
                    seed=cfgs.seed + epoch, loader=loader,
                )
            ):
                seq_ts, seq_images, seq_gt = batch  # [B,T,N], [B,T,N,H,W], [B,T,H,W,1]
                if seq_images.shape[0] % self.mesh.shape["data"]:
                    dropped_batches += 1  # reported at epoch end, never silent
                    continue  # tail batch not shardable across the data axis
                frames_seq = np.moveaxis(seq_images, 1, 0)  # [T,B,N,H,W]
                ts_seq = np.moveaxis(seq_ts, 1, 0).astype(np.float32)
                gt = seq_gt[:, -1]  # loss on the final reconstruction
                # host-side timestamp contract (reference raises on
                # non-advancing frame times, v2e_model.py:335-338)
                from v2e2v_tpu.models.emulator import validate_pack_times

                t_last = None
                for t_pack in range(ts_seq.shape[0]):
                    t_last = validate_pack_times(ts_seq[t_pack], t_last)

                key = jax.random.fold_in(self._noise_key, step_idx)
                self.params, self.opt_state, loss, aux = self.train_step(
                    self.params, self.opt_state, frames_seq, ts_seq, gt, key
                )
                # emulator saturation diagnostics: max_iters statically clips
                # the reference's unbounded per-pixel event loop
                # (v2e/v2e_model.py:449) — surface it instead of silently
                # under-emitting events on high-contrast data
                clip_now = int(aux["clipped_pixels"])
                if clip_now:
                    sat_clipped += clip_now
                    sat_max_count = max(sat_max_count, int(aux["max_event_count"]))
                if self.display is not None:
                    if n_batches % 50 == 0:
                        from v2e2v_tpu.utils.data_io import make_event_preview

                        panels = [frames_seq[-1, 0, -1]]  # last input frame
                        if cfgs.show_events:
                            panels.append(
                                make_event_preview(
                                    np.moveaxis(np.asarray(aux["voxel"][0]), -1, 0),
                                    mode=cfgs.event_display_mode,
                                    num_bins_to_show=cfgs.num_bins_to_show,
                                )
                            )
                        panels += [np.asarray(aux["rec"][0]), gt[0]]
                        self.display(panels, step_idx)
                loss = float(loss)
                epoch_loss_sum += loss
                if n_batches % 50 == 0:
                    print(
                        f"Train Epoch: {epoch + 1} [{n_batches * cfgs.batch_size}/"
                        f"{len(self.train_data)}]\tloss: {loss:.6f}"
                    )
                    logger.scalar("loss", loss, step_idx)
                step_idx += 1

            mean_loss = epoch_loss_sum / max(n_batches + 1, 1)
            print(
                f"epoch {epoch + 1} done in {time.time() - t_epoch:.1f}s, "
                f"mean loss {mean_loss:.5f}"
            )
            if dropped_batches:
                print(
                    f"warning: dropped {dropped_batches} tail batch(es) not "
                    f"divisible by the data-mesh axis "
                    f"({self.mesh.shape['data']}); use a divisible batch_size"
                )
                dropped_batches = 0
            if sat_clipped:
                print(
                    f"warning: emulator saturated on {sat_clipped} pixel-pairs "
                    f"this epoch — observed max per-pixel event count "
                    f"{sat_max_count} exceeds max_iters="
                    f"{self.cfg.emulator.max_iters}; raise --v2e_max_iters to "
                    f">= {sat_max_count} to match the reference's unbounded "
                    "event loop"
                )
                logger.scalar("emulator_clipped_pixels", sat_clipped, epoch)
                sat_clipped = 0
                sat_max_count = 0
            logger.scalar("epoch_mean_loss", mean_loss, epoch)
            self._save_checkpoint(
                os.path.join(self.path_to_model, f"{self.model_name}_{epoch + 1}"),
                {
                    "epoch": epoch + 1,
                    "params": self.params,
                    "opt_state": self.opt_state,
                    "v2e_params": self.v2e_params,
                },
            )
        if loader is not None:
            loader.close()
        logger.close()


if __name__ == "__main__":
    from v2e2v_tpu.utils.configs import set_configs

    parser = argparse.ArgumentParser(description="V2E2V training options")
    set_configs(parser)
    cfgs = parser.parse_args()
    cfgs.shuffle = True

    from v2e2v_tpu.utils.profiling import (
        apply_platform_override,
        enable_nan_debugging,
        maybe_profile,
    )

    apply_platform_override()

    from v2e2v_tpu.parallel.distributed import initialize_from_flags

    initialize_from_flags(cfgs)

    if cfgs.debug_nans:
        enable_nan_debugging()
    with maybe_profile(cfgs.profile_dir):
        Train(cfgs).run()
