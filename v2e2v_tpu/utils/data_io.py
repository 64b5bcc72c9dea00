"""Output writers and event previews.

Matches the reference's on-disk formats (``utils/data_io.py`` in
lsying009/V2E2V): PNG frames named ``frame_%010d.png`` under
``output_folder/model_name/dataset_name``, event previews under ``events/``,
tab-separated metric rows appended to ``result.csv``, RdBu error maps under
``error_maps/``.
"""

from __future__ import annotations

import csv
import os

import numpy as np
from PIL import Image


def make_event_preview(
    events: np.ndarray, mode: str = "grayscale", num_bins_to_show: int = -1
) -> np.ndarray:
    """Render a voxel grid to a preview image.

    ``events``: ``[C, H, W]`` or ``[1, C, H, W]`` (bins-first) numpy array.
    'red-blue' marks positive sums blue / negative red; grayscale clips the
    bin sum to +-5.
    """
    if events.ndim == 3:
        events = events[None]
    if num_bins_to_show < 0:
        sum_events = np.sum(events[0], axis=0)
    else:
        sum_events = np.sum(events[0, -num_bins_to_show:], axis=0)

    if mode == "red-blue":
        preview = np.zeros((*sum_events.shape, 3), dtype=np.uint8)
        preview[..., 0][sum_events > 0] = 255  # blue channel (BGR order kept)
        preview[..., 2][sum_events < 0] = 255
        return preview
    m, big = -5.0, 5.0
    return np.clip(255.0 * (sum_events - m) / (big - m), 0, 255).astype(np.uint8)


class Writer:
    def __init__(self, cfgs, model_name: str, dataset_name: str | None = None):
        self.output_folder = cfgs.output_folder
        self.dataset_name = dataset_name or cfgs.test_data_name
        os.makedirs(self.output_folder, exist_ok=True)
        self.output_data_folder = os.path.join(
            self.output_folder, model_name, f"{self.dataset_name}"
        )


class EvalWriter(Writer):
    """Append per-sequence metric rows to ``result.csv`` (tab-separated)."""

    def __init__(self, cfgs, model_name, dataset_name=None):
        super().__init__(cfgs, model_name, dataset_name)
        self.is_write_image = cfgs.is_write_image
        if self.is_write_image:
            os.makedirs(self.output_data_folder, exist_ok=True)
            self.output_txt_file = os.path.join(self.output_data_folder, "result.csv")

    def __call__(self, name_results, results):
        if not self.is_write_image:
            return
        with open(self.output_txt_file, "a+", newline="") as f:
            writer = csv.writer(f, delimiter="\t")
            writer.writerow(name_results)
            writer.writerow(results)


class ImageWriter(Writer):
    def __init__(self, cfgs, model_name, dataset_name=None):
        super().__init__(cfgs, model_name, dataset_name)
        self.is_write_image = cfgs.is_write_image
        if self.is_write_image:
            os.makedirs(self.output_data_folder, exist_ok=True)

    def __call__(self, img, img_id: int):
        if not self.is_write_image:
            return
        Image.fromarray(np.uint8(img)).save(
            os.path.join(self.output_data_folder, f"frame_{img_id:010d}.png")
        )


class EventWriter(Writer):
    def __init__(self, cfgs, model_name, dataset_name=None):
        super().__init__(cfgs, model_name, dataset_name)
        self.is_write_event = cfgs.is_write_event
        if self.is_write_event:
            self.output_data_folder = os.path.join(self.output_data_folder, "events")
            os.makedirs(self.output_data_folder, exist_ok=True)

    def __call__(self, img, img_id: int):
        if not self.is_write_event:
            return
        Image.fromarray(np.uint8(img)).save(
            os.path.join(self.output_data_folder, f"events_{img_id:010d}.png")
        )


class ErrorMapWriter(Writer):
    """RdBu difference maps between prediction and ground truth."""

    def __init__(self, cfgs, model_name, dataset_name=None):
        super().__init__(cfgs, model_name, dataset_name)
        self.is_write_emap = cfgs.is_write_emap
        if self.is_write_emap:
            self.output_data_folder = os.path.join(self.output_data_folder, "error_maps")
            os.makedirs(self.output_data_folder, exist_ok=True)

    def __call__(self, img, gt_img, img_id: int):
        if not self.is_write_emap:
            return
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        diff = img.astype(np.float32) / 255.0 - gt_img.astype(np.float32) / 255.0
        plt.imshow(diff, cmap="RdBu", vmin=-0.5, vmax=0.5)
        plt.axis("off")
        plt.savefig(
            os.path.join(self.output_data_folder, f"frame_{img_id:010d}.png"),
            bbox_inches="tight",
        )
        plt.close()


class DebugPanelWriter(Writer):
    """Headless replacement for the reference's interactive displays
    (``model_v2e2v.py:110-126`` matplotlib figures, ``v2e_model.py:278-287``
    cv2 windows): composes the panels side by side (each min-max normalized
    to uint8) and writes ``display/panel_%010d.png``. Wired to the
    ``--display_train`` / ``--display_test`` / ``--show_events`` flags."""

    def __init__(self, cfgs, model_name, dataset_name=None):
        super().__init__(cfgs, model_name, dataset_name)
        self.panel_folder = os.path.join(self.output_data_folder, "display")
        os.makedirs(self.panel_folder, exist_ok=True)

    @staticmethod
    def _to_u8(img: np.ndarray) -> np.ndarray:
        img = np.asarray(img)
        img = np.squeeze(img)
        if img.dtype == np.uint8:
            u8 = img
        else:
            img = img.astype(np.float64)
            lo, hi = float(img.min()), float(img.max())
            u8 = np.uint8(np.round(255.0 * (img - lo) / (hi - lo + 1e-12)))
        if u8.ndim == 2:
            u8 = np.stack([u8] * 3, axis=-1)
        return u8

    def __call__(self, panels, idx: int) -> str:
        """panels: list of 2D/3D arrays (float any range, or uint8)."""
        imgs = [self._to_u8(p) for p in panels]
        h = max(im.shape[0] for im in imgs)
        sep = np.full((h, 2, 3), 255, np.uint8)
        row = []
        for i, im in enumerate(imgs):
            if im.shape[0] < h:  # pad bottom
                im = np.pad(im, ((0, h - im.shape[0]), (0, 0), (0, 0)))
            row.append(im)
            if i < len(imgs) - 1:
                row.append(sep)
        panel = np.concatenate(row, axis=1)
        path = os.path.join(self.panel_folder, f"panel_{idx:010d}.png")
        Image.fromarray(panel).save(path)
        return path
