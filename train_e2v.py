#!/usr/bin/env python
"""E2V training CLI — reference-compatible flags.

Mirrors reference ``train_e2v.py`` (lsying009/V2E2V): fixed-event-count
training sequences, many-to-one loss (LPIPS + L1 + (1 - SSIM)) on the last
reconstruction of each length-``len_sequence`` window, Adam with 0.9x decay
every 10 epochs, checkpoint per epoch.

TPU design: the BPTT window is one compiled ``lax.scan`` step over a device
mesh (data-parallel over sequences, optional spatial sharding); gradients
all-reduce via pjit-inserted collectives. Checkpoints are orbax pytrees named
with the reference convention.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


class Train:
    def __init__(self, cfgs):
        import jax
        import optax

        from v2e2v_tpu.data.datasets import TrainFixNEventData
        from v2e2v_tpu.models.cista import (
            CistaConfig,
            init_cista_lstc,
            init_cista_tc,
        )
        from v2e2v_tpu.parallel.mesh import make_e2v_train_step, make_mesh
        from v2e2v_tpu.training.lpips_jax import make_lpips_fn
        from v2e2v_tpu.utils.checkpoint import (
            checkpoint_name,
            load_checkpoint,
            save_checkpoint,
        )

        self.cfgs = cfgs
        self.model_name = checkpoint_name(cfgs)
        self.path_to_model = os.path.join(cfgs.path_to_model, self.model_name)
        os.makedirs(self.path_to_model, exist_ok=True)

        self.cfg = CistaConfig(
            image_dim=tuple(cfgs.image_dim),
            base_channels=cfgs.base_channels,
            depth=cfgs.depth,
            num_bins=cfgs.num_bins,
            model_mode=cfgs.model_mode,
        )
        init_fn = init_cista_lstc if cfgs.model_mode == "cista-lstc" else init_cista_tc
        self.params = init_fn(jax.random.PRNGKey(cfgs.seed), self.cfg)

        resume_payload = None
        if cfgs.load_epoch_for_train:
            resume_payload = load_checkpoint(
                os.path.join(
                    self.path_to_model,
                    f"{self.model_name}_{cfgs.load_epoch_for_train}",
                )
            )
            self.params = resume_payload["params"]

        self.train_data = TrainFixNEventData(
            os.path.join(cfgs.path_to_train_data, "train_e2v.txt"), cfgs
        )
        print(f"training sequences: {len(self.train_data)}")

        # reference lr schedule: lr * 0.9^floor(epoch/10), stepped per epoch
        base_lr = cfgs.lr
        self.lr_for_epoch = lambda e: base_lr * (0.9 ** np.floor(e / 10.0))
        self.tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=self.lr_for_epoch(cfgs.load_epoch_for_train)
        )
        self.opt_state = self.tx.init(self.params)
        if resume_payload is not None:
            # true resume: Adam moments survive (the reference resets them,
            # a torch artifact; SURVEY §5 plans {epoch, params, opt_state})
            from v2e2v_tpu.utils.checkpoint import restore_opt_state

            self.opt_state = restore_opt_state(
                self.opt_state, resume_payload.get("opt_state")
            )

        # data-axis size must divide the batch; default to gcd(batch, devices)
        import math as _math

        n_data = (
            cfgs.mesh_data
            if cfgs.mesh_data > 0
            else _math.gcd(
                cfgs.batch_size, len(jax.devices()) // max(cfgs.mesh_spatial, 1)
            )
        )
        self.mesh = make_mesh(n_data, cfgs.mesh_spatial)
        self.lpips_fn = make_lpips_fn()
        if self.lpips_fn is None:
            print("LPIPS weights unavailable; training with L1 + (1 - SSIM) only")
        if getattr(cfgs, "device_data", "off") != "off":
            from v2e2v_tpu.parallel.mesh import make_e2v_train_step_device_data

            if not getattr(cfgs, "drop_seq_tails", False):
                raise SystemExit("--device_data requires --drop_seq_tails "
                                 "(uniform [T, ...] sample shapes)")
            self.train_step = make_e2v_train_step_device_data(
                self.cfg, self.tx, self.mesh, lpips_fn=self.lpips_fn,
                noise_std=0.1 if cfgs.add_noise else 0.0,
            )
        else:
            self.train_step = make_e2v_train_step(
                self.cfg, self.tx, self.mesh, lpips_fn=self.lpips_fn
            )

        # multi-host: only process 0 writes checkpoints (all processes
        # hold replicated params; a shared filesystem would race)
        def _gated_save(path, payload, _jax=jax):
            if _jax.process_index() == 0:
                save_checkpoint(path, payload)

        self._save_checkpoint = _gated_save

    def _upload_dataset(self):
        """--device_data: one-time upload of the whole uniform-shape training
        set to device HBM (bf16 halves it). See
        ``make_e2v_train_step_device_data`` for why (host-RAM transfer leak)."""
        import jax.numpy as jnp

        cfgs = self.cfgs
        dtype = jnp.bfloat16 if cfgs.device_data == "bf16" else jnp.float32
        ds = self.train_data
        seqs, gts = [], []
        for i in range(len(ds)):
            seq_events, _img, gt = ds._load_cacheable(i)
            seqs.append(seq_events.astype(np.float32))
            gts.append(gt)
        data = np.stack(seqs, 0)  # [N, T, H, W, nb]
        gt_all = np.stack(gts, 0)  # [N, H, W, 1]
        gbytes = data.nbytes * (0.5 if dtype == jnp.bfloat16 else 1.0) / 2**30
        print(f"uploading dataset to device: {data.shape} {cfgs.device_data} "
              f"({gbytes:.1f} GiB)")
        # bf16 casts on HOST (ml_dtypes) so only the final bytes transfer —
        # a 1000-sequence set is 13 GiB f32 but 6.5 GiB bf16, and an
        # upload-then-cast would need both resident in HBM at once.
        # Sharded along the sample axis over the data mesh axis so
        # per-device HBM is dataset/n_data (matches the step in_shardings).
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        if dtype == jnp.bfloat16:
            import ml_dtypes

            data = data.astype(ml_dtypes.bfloat16)
            gt_all = gt_all.astype(ml_dtypes.bfloat16)
        ds_shard = NamedSharding(self.mesh, PartitionSpec("data"))
        data_dev = jax.device_put(data, ds_shard)
        gt_dev = jax.device_put(gt_all, ds_shard)
        data_dev.block_until_ready()
        return data_dev, gt_dev

    def _run_device_data(self, logger):
        """Training loop over the device-resident dataset: per step the host
        sends ONLY an index array (and a PRNG key) — no per-batch H2D."""
        import jax
        import jax.numpy as jnp

        cfgs = self.cfgs
        data_dev, gt_dev = self._upload_dataset()
        n = len(self.train_data)
        bsz = cfgs.batch_size
        base_key = jax.random.PRNGKey(cfgs.seed + 17)

        if n % bsz:
            # jit needs a static batch shape, so the final partial batch is
            # padded to batch_size and the pad samples are loss-masked
            # (sample_weights in many_to_one_loss) — no samples dropped, no
            # recompile, and the reference DataLoader's drop_last=False
            # semantics are preserved
            print(f"note: final {n % bsz}-sample batch each epoch is padded "
                  f"to batch_size and loss-masked (n={n}, batch_size={bsz})")
        step_idx = 0
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
                # key from (epoch, batch-in-epoch): resume at epoch E continues
                # the original run's noise stream instead of replaying epoch 0
                key = jax.random.fold_in(
                    jax.random.fold_in(base_key, epoch), n_batches
                )
                self.params, self.opt_state, loss = self.train_step(
                    self.params, self.opt_state, data_dev, gt_dev, idx, key,
                    jnp.asarray(w),
                )
                loss = float(loss)
                epoch_loss_sum += loss
                if n_batches % 50 == 0:
                    print(
                        f"Train Epoch: {epoch + 1} [{n_batches * bsz}/{n}]"
                        f"\tloss: {loss:.6f}"
                    )
                    logger.scalar("loss", loss, step_idx)
                n_batches += 1
                step_idx += 1

            mean_loss = epoch_loss_sum / max(n_batches, 1)
            print(
                f"epoch {epoch + 1} done in {time.time() - t_epoch:.1f}s, "
                f"mean loss {mean_loss:.5f}"
            )
            logger.scalar("epoch_mean_loss", mean_loss, epoch)
            self._save_checkpoint(
                os.path.join(self.path_to_model, f"{self.model_name}_{epoch + 1}"),
                {
                    "epoch": epoch,
                    "params": self.params,
                    "opt_state": self.opt_state,
                },
            )
        logger.close()

    def run(self):
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

        from v2e2v_tpu.data.prefetch import device_prefetch
        from v2e2v_tpu.parallel.mesh import batch_sharding

        seq_shard = batch_sharding(self.mesh, time_leading=True)
        gt_shard = batch_sharding(self.mesh, time_leading=False)

        def to_device_layout(batch):
            seq_events, _img, gt = batch  # [B,T,H,W,nb], ..., [B,H,W,1]
            return np.moveaxis(seq_events, 1, 0), gt  # [T,B,H,W,nb]

        n_data = self.mesh.shape["data"]
        dropped = {"batches": 0, "samples": 0}

        def shardable(it):
            # drop tail batches the data axis can't divide (n_data > 1 only);
            # counted and reported per epoch — never a silent loss
            for batch in it:
                if batch[0].shape[0] % n_data == 0:
                    yield batch
                else:
                    dropped["batches"] += 1
                    dropped["samples"] += batch[0].shape[0]

        step_idx = 0
        for epoch in range(cfgs.load_epoch_for_train, cfgs.epochs):
            lr = float(self.lr_for_epoch(epoch))
            self.opt_state.hyperparams["learning_rate"] = np.asarray(lr, np.float32)
            print(f"lr: {lr}")
            self.train_data.epoch = epoch  # salts per-epoch noise draws
            t_epoch = time.time()
            n_batches = 0
            epoch_loss_sum = 0.0
            # background host pipeline + one-step-early device placement
            for voxel_seq, gt in device_prefetch(
                shardable(iterate_batches(
                    self.train_data, cfgs.batch_size, cfgs.shuffle,
                    seed=cfgs.seed + epoch, loader=loader,
                )),
                transform=to_device_layout,
                sharding=(seq_shard, gt_shard),
            ):
                self.params, self.opt_state, loss = self.train_step(
                    self.params, self.opt_state, voxel_seq, gt
                )
                loss = float(loss)
                epoch_loss_sum += loss
                if n_batches % 50 == 0:
                    print(
                        f"Train Epoch: {epoch + 1} [{n_batches * cfgs.batch_size}/"
                        f"{len(self.train_data)}]\tloss: {loss:.6f}"
                    )
                    logger.scalar("loss", loss, step_idx)
                n_batches += 1
                step_idx += 1

            mean_loss = epoch_loss_sum / max(n_batches, 1)
            print(
                f"epoch {epoch + 1} done in {time.time() - t_epoch:.1f}s, "
                f"mean loss {mean_loss:.5f}"
            )
            if dropped["batches"]:
                print(
                    f"warning: dropped {dropped['batches']} tail batch(es) "
                    f"({dropped['samples']} samples) not divisible by the "
                    f"data-mesh axis ({n_data}); use a divisible batch_size "
                    "to avoid this"
                )
                dropped["batches"] = dropped["samples"] = 0
            logger.scalar("epoch_mean_loss", mean_loss, epoch)
            self._save_checkpoint(
                os.path.join(self.path_to_model, f"{self.model_name}_{epoch + 1}"),
                {
                    "epoch": epoch,
                    "params": self.params,
                    "opt_state": self.opt_state,
                },
            )
        if loader is not None:
            loader.close()
        logger.close()


if __name__ == "__main__":
    from v2e2v_tpu.utils.configs import set_configs

    parser = argparse.ArgumentParser(description="E2V training options")
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
