#!/usr/bin/env python
"""Quality metrics for a V2E2V eval output tree (test.py writes PNGs only).

The reference ``test.py`` (lsying009/V2E2V test.py:63-126) writes
reconstructions and reports event counts but no quality metrics; paper
numbers come from a separate comparison against the input video. This
script closes that gap for our recorded runs: it pairs each written
reconstruction ``frame_{k}.png`` with the ground-truth input frame it
reconstructs (pack continuation advances ``num_pack_frames - 1`` frames per
reconstruction, so recon k <-> GT frame ``(num_pack_frames-1)*k``) and
computes MSE/PSNR/SSIM under the same conventions as the E2V eval path
(``test_e2v.py:113-131``: prediction u8/255 vs percentile-normalized GT).

Usage:
  python scripts/eval_v2e2v_metrics.py \
      --results results/v2e2v_recipe/<model_dir> \
      --gt data/synth_r4_test [--num_pack_frames 10]

Writes one tab-separated ``result.csv`` per sequence dir (same format as
``utils/data_io.py``'s writer) and prints the per-sequence + overall means.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", required=True, help="model output dir with sequence_*/")
    ap.add_argument("--gt", required=True, help="dataset dir with sequence_*/frames/")
    ap.add_argument("--num_pack_frames", type=int, default=10)
    args = ap.parse_args()

    import cv2

    from v2e2v_tpu.ops.image import normalize_image_percentile
    from v2e2v_tpu.utils.evaluate import mse, psnr, ssim

    stride = args.num_pack_frames - 1
    seq_dirs = sorted(
        d
        for d in os.listdir(args.results)
        if os.path.isdir(os.path.join(args.results, d))
    )
    if not seq_dirs:
        raise SystemExit(f"no sequence dirs under {args.results}")

    all_rows = []
    for seq in seq_dirs:
        seq_out = os.path.join(args.results, seq)
        frames_dir = os.path.join(args.gt, seq, "frames")
        recons = sorted(f for f in os.listdir(seq_out) if f.startswith("frame_"))
        rows = []
        for fname in recons:
            k = int(os.path.splitext(fname)[0].split("_")[-1])
            gt_path = os.path.join(frames_dir, f"frame_{stride * k:010d}.png")
            if not os.path.exists(gt_path):
                continue
            pred = cv2.imread(os.path.join(seq_out, fname), cv2.IMREAD_GRAYSCALE)
            gt = cv2.imread(gt_path, cv2.IMREAD_GRAYSCALE)
            h, w = pred.shape
            gt = gt[:h, :w]
            pred_f = pred.astype(np.float32) / 255.0
            gt_f = np.asarray(normalize_image_percentile(gt.astype(np.float32)))
            rows.append([mse(pred_f, gt_f), psnr(pred_f, gt_f), ssim(pred_f, gt_f)])
        if not rows:
            print(f"{seq}: no aligned GT frames, skipped")
            continue
        arr = np.asarray(rows)
        with open(os.path.join(seq_out, "result.csv"), "w") as f:
            f.write("mse\tpsnr\tssim\n")
            for r in rows:
                f.write("\t".join(f"{v:.6f}" for v in r) + "\n")
            m = arr.mean(axis=0)
            f.write("\t".join(f"{v:.6f}" for v in m) + "\n")
        print(
            f"{seq}: n={len(rows)} mse={arr[:, 0].mean():.4f} "
            f"psnr={arr[:, 1].mean():.2f} ssim={arr[:, 2].mean():.4f}"
        )
        all_rows.append(arr)

    total = np.concatenate(all_rows)
    m = total.mean(axis=0)
    print(
        f"OVERALL ({len(all_rows)} sequences, {len(total)} frames): "
        f"mse={m[0]:.4f} psnr={m[1]:.2f} ssim={m[2]:.4f}"
    )


if __name__ == "__main__":
    main()
