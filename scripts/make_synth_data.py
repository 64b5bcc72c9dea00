"""Generate a synthetic dataset in the reference's documented layout.

Layout (reference ``data_examples/README.md``):

    out_dir/
      train_e2v.txt        seq_id num_events t0 t1 frame0 frame1 events.npz
      train_v2e2v.txt      seq_id  [N timestamps]  [N frame paths]
      sequence_XXXXXXXXXX/
        frames/timestamps.txt + frame_XXXXXXXXXX.png
        events/events_XXXXXXXXXX.npz   (t, x, y, p arrays per interval)

Videos are random moving boxes/gradients over a textured background; events
come from an ideal numpy DVS model (per-pixel log-intensity threshold
crossings with linear-in-time interpolation), independent of the framework's
emulator so the two can cross-check each other.
"""

from __future__ import annotations

import argparse
import math
import os

import numpy as np
from PIL import Image


def render_video(rng, num_frames: int, h: int, w: int) -> np.ndarray:
    """Drifting multi-wave texture + moving boxes; returns [N, H, W] 0-255.

    The background is a sum of sinusoidal plane waves whose phases advance
    every frame (sub-pixel drift), so — like natural video — nearly every
    pixel sees intensity change and emits events, not just object edges.
    """
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    ii = np.arange(num_frames, dtype=np.float32)[:, None, None]
    bg = np.full((num_frames, h, w), 120.0, dtype=np.float32)
    for _ in range(int(rng.integers(3, 6))):
        wavelength = rng.uniform(15, 120)
        theta = rng.uniform(0, 2 * math.pi)
        kx = 2 * math.pi * math.cos(theta) / wavelength
        ky = 2 * math.pi * math.sin(theta) / wavelength
        amp = rng.uniform(10, 35)
        drift = rng.uniform(-0.35, 0.35)  # radians/frame: sub-pixel motion
        bg += amp * np.sin(kx * xx + ky * yy + rng.uniform(0, 2 * math.pi) + drift * ii)
    n_obj = rng.integers(2, 6)
    objs = []
    for _ in range(n_obj):
        objs.append(
            dict(
                cx=rng.uniform(0, w), cy=rng.uniform(0, h),
                vx=rng.uniform(-3, 3), vy=rng.uniform(-2, 2),
                sx=rng.uniform(8, 30), sy=rng.uniform(8, 30),
                val=rng.uniform(20, 235),
            )
        )
    frames = []
    for i in range(num_frames):
        img = bg[i].copy()
        for o in objs:
            cx = (o["cx"] + o["vx"] * i) % w
            cy = (o["cy"] + o["vy"] * i) % h
            x0, x1 = int(cx - o["sx"] / 2), int(cx + o["sx"] / 2)
            y0, y1 = int(cy - o["sy"] / 2), int(cy + o["sy"] / 2)
            img[max(y0, 0) : max(y1, 0), max(x0, 0) : max(x1, 0)] = o["val"]
        frames.append(np.clip(img, 0, 255))
    return np.stack(frames, 0)


def ideal_dvs_events(frames: np.ndarray, timestamps: np.ndarray, c: float = 0.25):
    """Per-interval ideal DVS events: log-threshold crossings, linear in time.

    Returns a list (len N-1) of [K,4] arrays (t, x, y, p in {0,1}).
    """
    log_frames = np.log(np.maximum(frames.astype(np.float64), 1.0) / 255.0 + 1e-3)
    n, h, w = frames.shape
    windows = []
    mem = log_frames[0].copy()
    for i in range(1, n):
        t0, t1 = timestamps[i - 1], timestamps[i]
        dl = log_frames[i] - mem
        count = np.floor(np.abs(dl) / c).astype(np.int64)
        ys, xs = np.nonzero(count)
        k_counts = count[ys, xs]
        # Expand each firing pixel into its k=1..count events, vectorized.
        idx = np.repeat(np.arange(len(ys)), k_counts)
        kk = (
            np.arange(int(k_counts.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(k_counts) - k_counts, k_counts)
            + 1
        )
        dl_r = dl[ys, xs][idx]
        ts = t0 + (t1 - t0) * (kk * c) / np.abs(dl_r)
        evs = np.stack(
            [ts, xs[idx].astype(np.float64), ys[idx].astype(np.float64),
             (dl_r > 0).astype(np.float64)], axis=1,
        )
        evs = evs[np.argsort(evs[:, 0], kind="stable")]
        mem[ys, xs] += np.sign(dl[ys, xs]) * k_counts * c
        windows.append(evs)
    return windows


def write_sequence(root: str, seq_idx: int, frames, timestamps, windows):
    seq_dir = os.path.join(root, f"sequence_{seq_idx:010d}")
    fdir = os.path.join(seq_dir, "frames")
    edir = os.path.join(seq_dir, "events")
    os.makedirs(fdir, exist_ok=True)
    os.makedirs(edir, exist_ok=True)

    with open(os.path.join(fdir, "timestamps.txt"), "w") as f:
        for i, t in enumerate(timestamps):
            f.write(f"{i} {t:.9f}\n")
    frame_rel = []
    for i, frame in enumerate(frames):
        name = f"frame_{i:010d}.png"
        Image.fromarray(frame.astype(np.uint8)).save(os.path.join(fdir, name))
        frame_rel.append(os.path.join(os.path.basename(seq_dir), "frames", name))
    event_rel = []
    for i, evs in enumerate(windows):
        name = f"events_{i:010d}.npz"
        np.savez(
            os.path.join(edir, name),
            t=evs[:, 0], x=evs[:, 1].astype(np.int16),
            y=evs[:, 2].astype(np.int16), p=evs[:, 3].astype(np.int16),
        )
        event_rel.append(os.path.join(os.path.basename(seq_dir), "events", name))
    return frame_rel, event_rel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--num_sequences", type=int, default=4)
    ap.add_argument("--num_frames", type=int, default=60)
    ap.add_argument("--image_dim", nargs=2, type=int, default=[180, 240])
    ap.add_argument("--num_pack_frames", type=int, default=10)
    ap.add_argument("--fps", type=float, default=1000.0)
    ap.add_argument("--contrast", type=float, default=0.25)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--start_index", type=int, default=1,
                    help="First sequence number (lets a second run extend an "
                    "existing set without id collisions; combine via "
                    "symlinks + manifest concat)")
    args = ap.parse_args()

    h, w = args.image_dim
    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out_dir, exist_ok=True)

    e2v_lines, v2e2v_lines = [], []
    for s in range(args.start_index, args.start_index + args.num_sequences):
        frames = render_video(rng, args.num_frames, h, w)
        timestamps = np.arange(args.num_frames) / args.fps
        windows = ideal_dvs_events(frames, timestamps, c=args.contrast)
        frame_rel, event_rel = write_sequence(args.out_dir, s, frames, timestamps, windows)

        for i, evs in enumerate(windows):
            e2v_lines.append(
                f"{s} {len(evs)} {timestamps[i]:.9f} {timestamps[i+1]:.9f} "
                f"{frame_rel[i]} {frame_rel[i+1]} {event_rel[i]}"
            )
        n = args.num_pack_frames
        for start in range(0, args.num_frames - n + 1, n - 1):
            ts = " ".join(f"{timestamps[start + j]:.9f}" for j in range(n))
            fr = " ".join(frame_rel[start + j] for j in range(n))
            v2e2v_lines.append(f"{s} {ts} {fr}")

    with open(os.path.join(args.out_dir, "train_e2v.txt"), "w") as f:
        f.write("\n".join(e2v_lines) + "\n")
    with open(os.path.join(args.out_dir, "train_v2e2v.txt"), "w") as f:
        f.write("\n".join(v2e2v_lines) + "\n")
    print(
        f"wrote {args.num_sequences} sequences x {args.num_frames} frames "
        f"({h}x{w}) to {args.out_dir}"
    )


if __name__ == "__main__":
    main()
