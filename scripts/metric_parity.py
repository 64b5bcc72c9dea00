#!/usr/bin/env python
"""End-to-end metric parity: this framework vs the reference model code.

Pipeline (all CPU so both sides share a deterministic platform):

1. Generate a synthetic dataset (train + held-out test sequences).
2. Train CISTA-LSTC with this framework's train step; save an orbax ckpt.
3. Run this repo's ``test_e2v.py`` CLI on the test sequences -> result.csv.
4. Export the params to a reference-named torch state_dict, load it into the
   GENUINE reference ``CistaLSTCNet`` (/root/reference/e2v/e2v_model.py), and
   drive the reference evaluation loop (reference ``ImageReader`` +
   ``update_event_frame_pack`` + cv2 MINMAX prediction normalization +
   percentile GT normalization + reference ``mse``/``psnr`` — the loop
   semantics of reference ``test_e2v.py:87-144``).
5. Compare per-sequence means within 1% (the north-star tolerance).

SSIM note: skimage is not installed here, so the reference's
``utils/evaluate.py`` ssim (skimage structural_similarity) cannot run; both
sides use this repo's skimage-compatible implementation — formula parity is
covered by its unit tests, while THIS script checks end-to-end pipeline
parity of everything upstream of the metric. LPIPS is omitted (weights are
unobtainable without egress).

Usage: python scripts/metric_parity.py [--work_dir DIR] [--epochs N]
Writes a markdown report to --report (default PARITY_RUN.md in the repo).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)


def force_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")


def make_data(work_dir: str, h: int, w: int):
    train_dir = os.path.join(work_dir, "train")
    test_dir = os.path.join(work_dir, "test")
    for out, n_seq, n_frames, seed in ((train_dir, 6, 60, 3), (test_dir, 2, 48, 91)):
        subprocess.run(
            [
                sys.executable, os.path.join(REPO, "scripts", "make_synth_data.py"),
                "--out_dir", out, "--num_sequences", str(n_seq),
                "--num_frames", str(n_frames), "--image_dim", str(h), str(w),
                "--num_pack_frames", "6", "--seed", str(seed),
            ],
            check=True, capture_output=True,
        )
    return train_dir, test_dir


def train(train_dir: str, ckpt_path: str, epochs: int, h: int, w: int, ch: int,
          depth: int, num_events: int, model_mode: str = "cista-lstc"):
    import jax
    import optax

    from v2e2v_tpu.data.datasets import TrainFixNEventData, iterate_batches
    from v2e2v_tpu.models.cista import (
        CistaConfig,
        init_cista_lstc,
        init_cista_tc,
    )
    from v2e2v_tpu.parallel.mesh import make_e2v_train_step, make_mesh
    from v2e2v_tpu.utils.checkpoint import save_checkpoint
    from v2e2v_tpu.utils.configs import set_configs

    parser = argparse.ArgumentParser()
    set_configs(parser)
    cfgs = parser.parse_args(
        ["--path_to_train_data", train_dir, "--image_dim", str(h), str(w),
         "--num_events", str(num_events), "--len_sequence", "3",
         "--base_channels", str(ch), "--depth", str(depth)]
    )
    cfg = CistaConfig(image_dim=(h, w), base_channels=ch, depth=depth,
                      num_bins=5, model_mode=model_mode)
    init_fn = init_cista_lstc if model_mode == "cista-lstc" else init_cista_tc
    params = init_fn(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)
    step = make_e2v_train_step(cfg, tx, make_mesh(1, 1))

    ds = TrainFixNEventData(os.path.join(train_dir, "train_e2v.txt"), cfgs)
    print(f"[train] {len(ds)} sequences, {epochs} epochs")
    for epoch in range(epochs):
        losses = []
        for seq_events, _img, gt in iterate_batches(ds, 1, shuffle=True, seed=epoch):
            voxel_seq = np.moveaxis(seq_events, 1, 0)
            params, opt_state, loss = step(params, opt_state, voxel_seq, gt)
            losses.append(float(loss))
        if epoch % 5 == 0 or epoch == epochs - 1:
            print(f"[train] epoch {epoch}: loss {np.mean(losses):.4f}")

    params = jax.tree_util.tree_map(np.asarray, params)
    save_checkpoint(ckpt_path, {"epoch": epochs, "params": params})
    return params


def run_our_cli(test_dir: str, ckpt_path: str, out_dir: str, h: int, w: int,
                ch: int, depth: int, num_events: int,
                model_mode: str = "cista-lstc"):
    env = dict(os.environ, V2E2V_PLATFORM="cpu")
    subprocess.run(
        [
            sys.executable, os.path.join(REPO, "test_e2v.py"),
            "--path_to_test_data", test_dir,
            "--path_to_test_model", ckpt_path,
            "--model_mode", model_mode,
            "--image_dim", str(h), str(w),
            "--base_channels", str(ch), "--depth", str(depth),
            "--num_events", str(num_events),
            "--test_data_mode", "upsampled", "--reader_type", "image_reader",
            "--test_img_num", "-1",
            "--output_folder", out_dir,
        ],
        check=True, env=env, cwd=REPO,
    )
    # parse result.csv per sequence: rows "Dataset MSE PSNR SSIM LPIPS N"
    results = {}
    model_name = os.path.splitext(os.path.basename(ckpt_path))[0]
    base = os.path.join(out_dir, model_name)
    for seq in sorted(os.listdir(base)):
        csv = os.path.join(base, seq, "result.csv")
        if not os.path.exists(csv):
            continue
        with open(csv) as f:
            lines = [ln.split() for ln in f.read().strip().splitlines()]
        row = lines[-1]
        results[seq] = {
            "mse": float(row[1]), "psnr": float(row[2]), "ssim": float(row[3]),
            "n": int(row[-1]),
        }
    return results


def _install_ref_stubs():
    """Stubs for reference imports unavailable here (no egress)."""
    import torch

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tf = types.ModuleType("torchvision.transforms")

        class ToTensor:
            def __call__(self, x):
                t = torch.from_numpy(np.ascontiguousarray(x))
                return t[None] if t.ndim == 2 else t.permute(2, 0, 1).contiguous()

        tf.ToTensor = ToTensor
        tv.transforms = tf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tf
    for name in ("skvideo", "skvideo.io", "lpips", "skimage", "skimage.metrics"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["skvideo"].io = sys.modules["skvideo.io"]

    def _unavailable(*a, **k):
        raise RuntimeError("skimage is not installed in this environment")

    sys.modules["skimage"].metrics = sys.modules["skimage.metrics"]
    sys.modules["skimage.metrics"].structural_similarity = _unavailable
    sys.modules["lpips"].LPIPS = _unavailable


def run_reference(test_dir: str, params, h: int, w: int, ch: int, depth: int,
                  num_events: int, model_mode: str = "cista-lstc"):
    """Drive the genuine reference model + reader + normalization + metrics
    (loop semantics of reference ``test_e2v.py:87-144``, CPU).

    For ``cista-tc`` the reference CLI path is broken as shipped (its ctor
    takes no ``image_dim`` yet ``test_e2v.py:58`` passes one — SURVEY.md C2);
    the genuine ``CistaTCNet`` module itself constructs and runs fine, so the
    comparison drives it directly with the reference loop semantics."""
    import cv2
    import torch

    _install_ref_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from data_readers.video_readers import ImageReader as RefImageReader
    from e2v.e2v_model import CistaLSTCNet, CistaTCNet
    from utils.evaluate import mse as ref_mse
    from utils.evaluate import psnr as ref_psnr
    from utils.image_process import normalize_image as ref_normalize_image

    from v2e2v_tpu.utils.checkpoint import export_torch_state_dict
    from v2e2v_tpu.utils.evaluate import ssim as shared_ssim

    if model_mode == "cista-lstc":
        net = CistaLSTCNet(image_dim=(h, w), base_channels=ch, depth=depth,
                           num_bins=5)
    else:
        net = CistaTCNet(base_channels=ch, depth=depth, num_bins=5)
    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_torch_state_dict(params, model_mode, depth=depth).items()
    }
    net.load_state_dict(sd, strict=True)
    net.eval()

    results = {}
    seqs = sorted(
        d for d in os.listdir(test_dir)
        if os.path.isdir(os.path.join(test_dir, d))
    )
    for seq in seqs:
        reader = RefImageReader([h, w], num_bins=5, is_with_events=True)
        reader.initialize(os.path.join(test_dir, seq), -1)
        states, prev_image = None, torch.zeros(1, 1, h, w)
        rows = []
        with torch.no_grad():
            while not reader.ending:
                events, gt_frame = reader.update_event_frame_pack(
                    num_events, "upsampled"
                )
                for evs in events:
                    # float(): numpy>=2 scalar promotion makes the reference
                    # event_preprocess emit float64; the original torch flow
                    # assumed float32 grids
                    evs = torch.from_numpy(evs).float()[None]
                    pred, states = net(evs, prev_image, states)
                    prev_image = pred.detach()
                pred_np = pred.squeeze().numpy()
                pred_u8 = np.uint8(
                    cv2.normalize(pred_np, None, 0, 255, cv2.NORM_MINMAX)
                )
                gt_norm = (
                    ref_normalize_image(torch.from_numpy(gt_frame).float())
                    .squeeze().numpy()
                )
                rows.append([
                    ref_mse(pred_u8 / 255.0, gt_norm),
                    ref_psnr(pred_u8 / 255.0, gt_norm),
                    shared_ssim(pred_u8 / 255.0, gt_norm),
                ])
        m = np.mean(np.array(rows), axis=0)
        results[seq] = {
            "mse": round(float(m[0]), 4), "psnr": round(float(m[1]), 4),
            "ssim": round(float(m[2]), 4), "n": len(rows),
        }
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work_dir", default="/tmp/v2e2v_metric_parity")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--image_dim", nargs=2, type=int, default=[32, 40])
    ap.add_argument("--base_channels", type=int, default=16)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--num_events", type=int, default=600)
    ap.add_argument("--model_mode", default="cista-lstc",
                    choices=["cista-lstc", "cista-tc"])
    ap.add_argument("--report", default=os.path.join(REPO, "PARITY_RUN.md"))
    ap.add_argument("--ckpt", default=None,
                    help="Existing orbax checkpoint — skip data-gen/training "
                    "and check parity of this model (e.g. the flagship)")
    ap.add_argument("--test_dir", default=None,
                    help="Existing test-sequence folder (required with --ckpt)")
    args = ap.parse_args()

    force_cpu()
    h, w = args.image_dim
    os.makedirs(args.work_dir, exist_ok=True)
    if args.ckpt:
        if not args.test_dir:
            ap.error("--ckpt requires --test_dir")
        from v2e2v_tpu.utils.checkpoint import load_checkpoint

        ckpt, test_dir = args.ckpt, args.test_dir
        params = load_checkpoint(ckpt)["params"]
    else:
        train_dir, test_dir = make_data(args.work_dir, h, w)
        ckpt = os.path.join(args.work_dir, "parity_ckpt")
        params = train(
            train_dir, ckpt, args.epochs, h, w, args.base_channels, args.depth,
            args.num_events, model_mode=args.model_mode,
        )
    ours = run_our_cli(
        test_dir, ckpt, os.path.join(args.work_dir, "out"), h, w,
        args.base_channels, args.depth, args.num_events,
        model_mode=args.model_mode,
    )
    theirs = run_reference(
        test_dir, params, h, w, args.base_channels, args.depth,
        args.num_events, model_mode=args.model_mode,
    )

    lines = [
        "# End-to-end metric parity run",
        "",
        f"Config: {args.model_mode.upper()} {h}x{w}, "
        f"{args.base_channels}ch, depth {args.depth}, "
        + (f"checkpoint `{os.path.basename(args.ckpt)}`, "
           if args.ckpt else
           f"trained {args.epochs} epochs on synthetic data (seed-pinned), ")
        + f"evaluated on held-out synthetic sequences with "
        f"`--test_data_mode upsampled --num_events {args.num_events}`.",
        "",
        "This framework's `test_e2v.py` CLI vs the GENUINE reference model + "
        "reader + normalization + MSE/PSNR (`/root/reference/e2v/e2v_model.py`, "
        "`data_readers/video_readers.py`, `utils/evaluate.py`) with identical "
        "exported weights. SSIM uses this repo's skimage-compatible formula on "
        "both sides (skimage itself is not installed); LPIPS omitted (weights "
        "unobtainable offline).",
        "",
        "| sequence | side | MSE | PSNR | SSIM | frames |",
        "|---|---|---|---|---|---|",
    ]
    ok = True
    for seq in sorted(ours):
        o, t = ours[seq], theirs[seq]
        lines.append(
            f"| {seq} | this repo | {o['mse']:.4f} | {o['psnr']:.4f} | "
            f"{o['ssim']:.4f} | {o['n']} |"
        )
        lines.append(
            f"| {seq} | reference | {t['mse']:.4f} | {t['psnr']:.4f} | "
            f"{t['ssim']:.4f} | {t['n']} |"
        )
        for k in ("mse", "psnr", "ssim"):
            denom = max(abs(t[k]), 1e-6)
            rel = abs(o[k] - t[k]) / denom
            if rel > 0.01:
                ok = False
                lines.append(f"|  | **MISMATCH {k}: {rel*100:.2f}%** | | | | |")
        if o["n"] != t["n"]:
            ok = False
            lines.append("|  | **frame-count mismatch** | | | | |")
    lines += ["", f"**Verdict: {'PASS' if ok else 'FAIL'}** (tolerance 1% relative)."]
    report = "\n".join(lines) + "\n"
    with open(args.report, "w") as f:
        f.write(report)
    print(report)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
