"""Training datasets (host side, numpy).

Behavioral spec from reference ``data_readers/train_data_loaders.py``
(lsying009/V2E2V):

- ``TrainFixNEventData`` (:106-222) for E2V training: manifest lines are
  ``seq_id num_events t0 t1 frame0 frame1 events.npz``; consecutive intervals
  are greedily grouped until the cumulative event count reaches the budget
  (or a single interval already holds >= 80% of it); ``len_sequence`` groups
  form one training sample; per group the npz events are concatenated and
  voxelized (no hot-pixel filter), optionally noised.
- ``TrainSeqData`` (:10-103) for V2E2V training: manifest lines are
  ``seq_id, N timestamps, N frame paths``; line windows of ``len_sequence``
  stepping 5 lines (tails >= 3 kept); frames stay in 0-255 (the emulator's
  input domain); ground truth is the last frame / 255.

Arrays are NHWC / bins-last (the TPU layout used by the models).
"""

from __future__ import annotations

import os

import numpy as np

from ..ops.voxel import voxelize_and_preprocess_np


class TrainFixNEventData:
    """E2V training samples: sequences of fixed-event-count voxel grids."""

    def __init__(self, train_data_txt: str, cfgs):
        self.path_to_train_data = cfgs.path_to_train_data
        self.num_bins = cfgs.num_bins
        self.height, self.width = cfgs.image_dim
        self.limit_num_events = cfgs.num_events
        self.len_sequence = cfgs.len_sequence
        self.add_noise = cfgs.add_noise

        video_cnt, num_events_list = [], []
        self.image_paths, self.next_image_paths, self.event_paths = [], [], []
        with open(train_data_txt) as f:
            for line in f:
                parts = line.strip().split()
                if not parts:
                    continue
                video_cnt.append(int(parts[0]))
                num_events_list.append(int(parts[1]))
                self.image_paths.append(parts[4])
                self.next_image_paths.append(parts[5])
                self.event_paths.append(parts[6])
        self._split_sequences(video_cnt, num_events_list)
        if getattr(cfgs, "drop_seq_tails", False):
            # uniform [T, ...] shapes: one XLA compile instead of one per
            # distinct tail length (--drop_seq_tails)
            self.sequence_line_id = [
                s for s in self.sequence_line_id if len(s) == self.len_sequence
            ]
        self._noise_rng = np.random.default_rng(getattr(cfgs, "seed", 0))

    def _split_sequences(self, video_cnt, num_events_list):
        """Greedy grouping (reference :149-184)."""
        prev_video_id = -1
        sum_events = 0
        self.sequence_line_id = []
        group, sequence = [], []
        frame_cnt = single_cnt = 0
        for line_id, video_id in enumerate(video_cnt):
            if video_id != prev_video_id:
                if len(sequence) >= 5:
                    if group:
                        sequence.append(group)
                    self.sequence_line_id.append(sequence)
                sequence, group = [], []
                prev_video_id = video_id
                sum_events = single_cnt = frame_cnt = 0

            sum_events += num_events_list[line_id]
            group.append(line_id)
            single_cnt += 1
            if sum_events >= self.limit_num_events or (
                single_cnt == 1 and sum_events > 0.8 * self.limit_num_events
            ):
                sequence.append(group)
                frame_cnt += 1
                sum_events = single_cnt = 0
                group = []
            if frame_cnt >= self.len_sequence:
                self.sequence_line_id.append(sequence)
                sequence, group = [], []
                frame_cnt = 0

    def __len__(self):
        return len(self.sequence_line_id)

    def _voxelize(self, events: np.ndarray) -> np.ndarray:
        grid = voxelize_and_preprocess_np(
            events, self.num_bins, self.width, self.height, filter_hot_pixel=False
        )
        return np.moveaxis(grid, 0, -1)  # bins-last

    def __getitem__(self, index):
        import cv2

        sequence = self.sequence_line_id[index]
        seq_events = []
        for group in sequence:
            windows = []
            for line_id in group:
                data = np.load(
                    os.path.join(self.path_to_train_data, self.event_paths[line_id]),
                    allow_pickle=True,
                )
                windows.append(
                    np.stack((data["t"], data["x"], data["y"], data["p"]), axis=1)
                )
            events = np.concatenate(windows, 0)
            grid = self._voxelize(events)
            if self.add_noise:
                noise = 0.1 * self._noise_rng.normal(size=grid.shape).astype(np.float32)
                grid = grid + noise
            seq_events.append(grid)

        img = cv2.imread(
            os.path.join(self.path_to_train_data, self.image_paths[sequence[0][0]]),
            cv2.IMREAD_GRAYSCALE,
        ).astype(np.float32) / 255.0
        gt = cv2.imread(
            os.path.join(self.path_to_train_data, self.next_image_paths[sequence[-1][-1]]),
            cv2.IMREAD_GRAYSCALE,
        ).astype(np.float32) / 255.0

        return (
            np.stack(seq_events, 0),  # [T, H, W, nb]
            img[..., None],  # [H, W, 1]
            gt[..., None],  # [H, W, 1]
        )


class TrainSeqData:
    """V2E2V training samples: sequences of HFR frame packs."""

    def __init__(
        self,
        train_data_txt,
        path_to_train_data,
        len_sequence,
        num_pack_frames,
        drop_seq_tails: bool = False,
    ):
        self.path_to_train_data = path_to_train_data
        self.len_sequence = len_sequence
        self.num_pack_frames = num_pack_frames
        self.drop_seq_tails = drop_seq_tails

        self.timestamps: list[float] = []
        self.image_paths: list[str] = []
        video_lines: list[list[int]] = []
        cur_lines: list[int] = []
        prev_video = 0
        line_id = 0
        with open(train_data_txt) as f:
            for line in f:
                parts = line.strip().split()
                if not parts:
                    continue
                v = int(parts[0])
                if v != prev_video:
                    video_lines.append(cur_lines)
                    cur_lines = []
                    prev_video = v
                cur_lines.append(line_id)
                line_id += 1
                n = self.num_pack_frames
                for i in range(n):
                    self.timestamps.append(float(parts[1 + i]))
                    self.image_paths.append(
                        os.path.join(path_to_train_data, parts[n + 1 + i])
                    )
        video_lines.append(cur_lines)

        self.start_seq_id, self.len_seq = [], []
        step = 5
        for lines in video_lines:
            for idx in range(0, len(lines), step):
                if idx + self.len_sequence <= len(lines):
                    self.start_seq_id.append(lines[idx])
                    self.len_seq.append(self.len_sequence)
                elif len(lines) - idx >= 3 and not self.drop_seq_tails:
                    self.start_seq_id.append(lines[idx])
                    self.len_seq.append(len(lines) - idx)

    def __len__(self):
        return len(self.start_seq_id)

    def __getitem__(self, index):
        import cv2

        seq_id = self.start_seq_id[index]
        cur_len = self.len_seq[index]
        n = self.num_pack_frames

        seq_ts, seq_images, seq_gt = [], [], []
        for m in range(cur_len):
            start = (seq_id + m) * n
            ts = np.asarray(self.timestamps[start : start + n], np.float64)
            imgs = [
                cv2.imread(self.image_paths[start + i], cv2.IMREAD_GRAYSCALE).astype(
                    np.float32
                )
                for i in range(n)
            ]
            images = np.stack(imgs, 0)  # [N, H, W], 0-255 (emulator domain)
            seq_ts.append(ts)
            seq_images.append(images)
            seq_gt.append(images[-1][..., None] / 255.0)

        return (
            np.stack(seq_ts, 0),  # [T, N]
            np.stack(seq_images, 0),  # [T, N, H, W]
            np.stack(seq_gt, 0),  # [T, H, W, 1]
        )


def iterate_batches(dataset, batch_size: int = 1, shuffle: bool = True, seed: int = 0):
    """Yield batch-first stacked numpy batches ``tuple[np.ndarray [B, ...]]``.

    A batch is flushed early when the next sample's shapes differ
    (variable-length sequence tails — the reference documents that
    ``--batch_size`` must be 1 when sequence length is not fixed).
    """
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)

    def flush(batch):
        return tuple(np.stack(parts, 0) for parts in zip(*batch))

    batch = []
    for idx in order:
        sample = dataset[int(idx)]
        if batch and any(b.shape != s.shape for b, s in zip(batch[0], sample)):
            yield flush(batch)
            batch = []
        batch.append(sample)
        if len(batch) == batch_size:
            yield flush(batch)
            batch = []
    if batch:
        yield flush(batch)
