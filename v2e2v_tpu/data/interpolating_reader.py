"""LFR-sequence reader with Super-SloMo adaptive upsampling.

Reference ``VideoInterpolator`` (``data_readers/video_readers.py:185-265``):
read all frames + timestamps from the folder, run the adaptive upsampler at
initialization, then serve the upsampled frames like an in-memory reader;
optional event iterators for eval.
"""

from __future__ import annotations

import os

import numpy as np

from .video_readers import PackReader, _scan_sequence_folder, read_timestamps_file


class InterpolatingReader(PackReader):
    def __init__(
        self,
        image_dim,
        num_bins: int = 5,
        is_with_events: bool = False,
        time_unit: str = "s",
        ckpt_path: str | None = None,
    ):
        super().__init__(image_dim, num_bins, is_with_events)
        self.time_unit = time_unit
        self.ckpt_path = ckpt_path
        self._upsampler = None

    def initialize(self, path_to_sequence: str, num_load_frames: int = -1):
        import cv2

        from ..models.superslomo import Upsampler

        self.frame_id = 0
        self.ending = False
        path_to_frames, path_to_events, ts_path = _scan_sequence_folder(path_to_sequence)
        if num_load_frames > 0:
            path_to_frames = path_to_frames[:num_load_frames]
        timestamps = read_timestamps_file(ts_path, self.time_unit)
        if num_load_frames > 0:
            timestamps = timestamps[:num_load_frames]

        demo = cv2.imread(path_to_frames[0], cv2.IMREAD_GRAYSCALE)
        self.height = (demo.shape[0] // 2) * 2
        self.width = (demo.shape[1] // 2) * 2
        self.prev_ts_cache = np.zeros(1, dtype=np.float64)

        frames = [
            cv2.imread(p, cv2.IMREAD_GRAYSCALE)[: self.height, : self.width]
            for p in path_to_frames
        ]

        if self._upsampler is None:
            self._upsampler = Upsampler(
                [self.height, self.width], is_train=False, ckpt_path=self.ckpt_path
            )
        self.frames, self.timestamps = self._upsampler.upsampling(frames, timestamps)
        self.num_frames = len(self.timestamps)

        if self.is_with_events:
            self._setup_event_iterator(path_to_events, num_load_frames)

    def update_frame(self):
        frame = self.frames[self.frame_id]
        t = self.timestamps[self.frame_id]
        self.frame_id += 1
        return frame, t
