#!/usr/bin/env python
"""V2E2V end-to-end inference CLI — reference-compatible flags.

Mirrors reference ``test.py`` (lsying009/V2E2V): read HFR video (directly,
from image folders, or via Super-SloMo upsampling of LFR sequences), emulate
events pack-by-pack, reconstruct frames, write min-max-normalized PNGs and
red-blue event previews, and report average events per reconstruction.
Emulator parameters stored in the checkpoint (``v2e_params``) override the
command-line flags, as in the reference (:76-83).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


class V2E2V:
    def __init__(self, cfgs):
        import jax

        from v2e2v_tpu.models.v2e2v import V2E2VConfig, v2e2v_forward
        from v2e2v_tpu.utils.checkpoint import load_checkpoint, load_torch_checkpoint

        self.cfgs = cfgs
        self.image_dim = cfgs.image_dim
        self.num_pack_frames = cfgs.num_pack_frames
        self.num_load_frames = cfgs.test_img_num
        self.test_data_name = cfgs.test_data_name

        if cfgs.reader_type == "video":
            from v2e2v_tpu.data.video_readers import VideoReader

            self.path_to_sequences = sorted(
                os.path.join(cfgs.path_to_test_data, f)
                for f in os.listdir(cfgs.path_to_test_data)
                if os.path.isfile(os.path.join(cfgs.path_to_test_data, f))
                and not f.startswith(".")
                and f.rsplit(".", 1)[-1] != "txt"
            )
            self.video_renderer = VideoReader(self.image_dim, ds=(0.25, 0.25))
        else:
            self.path_to_sequences = sorted(
                os.path.join(cfgs.path_to_test_data, d)
                for d in os.listdir(cfgs.path_to_test_data)
                if os.path.isdir(os.path.join(cfgs.path_to_test_data, d))
            )
            if cfgs.reader_type == "upsampling":
                from v2e2v_tpu.data.interpolating_reader import InterpolatingReader

                self.video_renderer = InterpolatingReader(
                    self.image_dim, time_unit=cfgs.time_unit
                )
            else:
                from v2e2v_tpu.data.video_readers import ImageReader

                self.video_renderer = ImageReader(
                    self.image_dim, time_unit=cfgs.time_unit
                )

        path = cfgs.path_to_test_model
        self.model_name = os.path.splitext(os.path.basename(path))[0]
        v2e_params = None
        if path.endswith((".pth.tar", ".pth", ".pt")):
            params, _, v2e_params = load_torch_checkpoint(path, "cista-lstc")
        else:
            payload = load_checkpoint(path)
            params = payload["params"]
            v2e_params = payload.get("v2e_params")

        if v2e_params:  # checkpoint overrides flags (reference :76-83)
            for k in ("C", "ps", "pl", "cutoff_hz", "qs", "ql", "refractory_period_s"):
                setattr(cfgs, k, float(v2e_params[k]))

        self.cfg = V2E2VConfig.from_flags(cfgs)
        self.params = params
        self._forward = v2e2v_forward
        self._key = jax.random.key(cfgs.seed, impl=cfgs.rng_impl)

    def run(self):
        import jax.numpy as jnp

        from v2e2v_tpu.ops.image import normalize_image_minmax_u8
        from v2e2v_tpu.utils.data_io import EventWriter, ImageWriter, make_event_preview

        import jax

        for seq_id, path in enumerate(self.path_to_sequences):
            dataset_name = os.path.basename(path).split(".")[0]
            if self.test_data_name is not None and dataset_name != self.test_data_name:
                continue
            # distinct per-sequence key: the reference's global torch RNG
            # advances across per-sequence resets (v2e_model.py:183-214), so
            # each sequence draws fresh per-pixel thresholds/noise
            seq_key = jax.random.fold_in(self._key, seq_id)
            self.video_renderer.initialize(path, self.num_load_frames)
            num_packs = (
                int(np.floor(self.video_renderer.num_frames / (self.num_pack_frames - 1)))
                - 1
            )
            print(
                f"Sequence {path}: {self.video_renderer.num_frames} frames, "
                f"{self.num_pack_frames} per reconstruction"
            )

            state = None  # fresh sequence -> emulator + recon state reset
            t_last = None  # host-side timestamp contract (v2e_model.py:335-338)
            num_events = 0
            sat_clipped = 0
            sat_max_count = 0
            image_writer = ImageWriter(self.cfgs, self.model_name, dataset_name)
            event_writer = EventWriter(self.cfgs, self.model_name, dataset_name)
            display = None
            if self.cfgs.display_test:
                # headless stand-in for the reference's matplotlib preview
                # (model_v2e2v.py:110-126): input | events | reconstruction
                from v2e2v_tpu.utils.data_io import DebugPanelWriter

                display = DebugPanelWriter(self.cfgs, self.model_name, dataset_name)

            for frame_idx in range(num_packs):
                frames, _gt, timestamps = self.video_renderer.update_frame_pack(
                    self.num_pack_frames
                )
                if frames.shape[0] <= 1:
                    continue
                from v2e2v_tpu.models.emulator import validate_pack_times

                t_last = validate_pack_times(timestamps, t_last)
                frames_j = jnp.asarray(frames, jnp.float32)[None]
                ts_j = jnp.asarray(timestamps, jnp.float32)[None]

                out, state = self._forward(
                    self.params, self.cfg, frames_j, ts_j, state, key=seq_key,
                    with_stats=True,
                )
                clip_now = int(out.stats.clipped_pixels)
                if clip_now:
                    sat_clipped += clip_now
                    sat_max_count = max(sat_max_count, int(out.stats.max_event_count))
                pred = np.asarray(out.reconstruction[0, ..., 0])
                image_writer(normalize_image_minmax_u8(pred), frame_idx + 1)

                voxel_bins_first = np.moveaxis(
                    np.asarray(out.event_voxel_grids[0]), -1, 0
                )
                event_writer(
                    make_event_preview(voxel_bins_first, mode="red-blue"), frame_idx + 1
                )
                num_events += int(out.num_events)

                if display is not None:
                    panels = [frames[-1]]
                    if self.cfgs.show_events:
                        panels.append(
                            make_event_preview(
                                voxel_bins_first,
                                mode=self.cfgs.event_display_mode,
                                num_bins_to_show=self.cfgs.num_bins_to_show,
                            )
                        )
                    panels.append(pred)
                    display(panels, frame_idx + 1)

            if num_packs > 0:
                print(
                    "Avg number of events per reconstruction: "
                    f"{num_events / num_packs:.1f}"
                )
            if sat_clipped:
                print(
                    f"warning: emulator saturated on {sat_clipped} "
                    f"pixel-pairs (max per-pixel event count {sat_max_count} "
                    f"> max_iters={self.cfg.emulator.max_iters}); raise "
                    f"--v2e_max_iters to >= {sat_max_count}"
                )


if __name__ == "__main__":
    from v2e2v_tpu.utils.configs import set_configs

    parser = argparse.ArgumentParser(description="V2E2V testing options")
    set_configs(parser)
    cfgs = parser.parse_args()

    from v2e2v_tpu.utils.profiling import apply_platform_override

    apply_platform_override()

    from v2e2v_tpu.parallel.distributed import initialize_from_flags

    initialize_from_flags(cfgs)

    V2E2V(cfgs).run()
