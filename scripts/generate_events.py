"""V2E generation tool: HFR frame sequences -> raw event files (.npz).

The reference drives event generation through its companion V2E_Generation
flow using the same emulator (README "Event generation ... C=0.6 pl=1.5
ps=0.5 fc=200"); here the framework's raw-mode emulator produces
per-interval ``events_XXXXXXXXXX.npz`` files (t, x, y, p) next to the
frames, in the documented dataset layout. Timestamps are converted from the
emulator's bin units back to seconds.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from v2e2v_tpu.utils.profiling import apply_platform_override

    apply_platform_override()  # V2E2V_PLATFORM=cpu + persistent compile cache

    import jax
    import jax.numpy as jnp

    from v2e2v_tpu.data.video_readers import ImageReader
    from v2e2v_tpu.models.emulator import EmulatorConfig, emulate_pack_raw
    from v2e2v_tpu.utils.configs import set_configs

    parser = argparse.ArgumentParser(description="V2E raw event generation")
    set_configs(parser)
    cfgs = parser.parse_args()

    emu = EmulatorConfig(
        output_mode="raw",
        num_bins=cfgs.num_bins,
        pl=cfgs.pl, ps=cfgs.ps, ql=cfgs.ql, qs=cfgs.qs,
        pos_thres=cfgs.C, neg_thres=cfgs.C,
        sigma_thres=cfgs.threshold_sigma,
        cutoff_hz=cfgs.cutoff_hz,
        refractory_period_s=cfgs.refractory_period_s,
        leak_rate_hz=0.1, shot_noise_rate_hz=1.0,
    )
    key = jax.random.PRNGKey(cfgs.seed)

    sequences = sorted(
        os.path.join(cfgs.path_to_test_data, d)
        for d in os.listdir(cfgs.path_to_test_data)
        if os.path.isdir(os.path.join(cfgs.path_to_test_data, d))
    )
    for path in sequences:
        name = os.path.basename(path)
        if cfgs.test_data_name is not None and name != cfgs.test_data_name:
            continue
        reader = ImageReader(cfgs.image_dim, time_unit=cfgs.time_unit)
        reader.initialize(path, cfgs.test_img_num)
        out_dir = os.path.join(cfgs.output_folder, name, "events")
        os.makedirs(out_dir, exist_ok=True)

        state = None
        pack_idx = 0
        interval_idx = 0
        total = 0
        n = cfgs.num_pack_frames
        num_packs = int(np.floor(reader.num_frames / (n - 1))) - 1
        for _ in range(max(num_packs, 0)):
            frames, _gt, timestamps = reader.update_frame_pack(n)
            if frames.shape[0] <= 1:
                continue
            t0 = float(timestamps[0])
            t_span = float(timestamps[min(len(timestamps), frames.shape[0]) - 1]) - t0
            events, n_ev, state = emulate_pack_raw(
                emu, state,
                jnp.asarray(frames, jnp.float32)[None],
                jnp.asarray(timestamps, jnp.float32)[None],
                key=key,
            )
            # bin units -> seconds over this pack's window, then split per
            # frame interval (documented layout: events_i.npz holds the raw
            # events between frame_i and frame_i+1)
            t_sec = t0 + events[:, 0] * (t_span / max(cfgs.num_bins - 1, 1))
            n_pairs = frames.shape[0] - 1
            bounds = np.asarray(timestamps[: frames.shape[0]], np.float64)
            order = np.argsort(t_sec, kind="stable")
            t_sorted = t_sec[order]
            ev_sorted = events[order]
            for j in range(n_pairs):
                lo = np.searchsorted(t_sorted, bounds[j], side="left" if j else "right")
                hi = np.searchsorted(t_sorted, bounds[j + 1], side="right")
                if j == 0:
                    lo = 0
                np.savez(
                    os.path.join(out_dir, f"events_{interval_idx:010d}.npz"),
                    t=t_sorted[lo:hi],
                    x=ev_sorted[lo:hi, 1].astype(np.int16),
                    y=ev_sorted[lo:hi, 2].astype(np.int16),
                    p=ev_sorted[lo:hi, 3].astype(np.int16),
                )
                interval_idx += 1
            total += n_ev
            pack_idx += 1
        print(f"{name}: {pack_idx} packs / {interval_idx} intervals, {total} events -> {out_dir}")


if __name__ == "__main__":
    main()
