"""Event file readers (host side).

Behavioral spec from reference ``data_readers/event_readers.py``
(lsying009/V2E2V): ``RefTimeEventReaderZip`` (:6-57) loads a whole
``[t x y p]`` text/csv/zip table, rebases times to the first image timestamp,
and iterates non-overlapping windows between consecutive image timestamps;
``SingleEventReaderNpz`` (:60-84) yields one ``[N,4]`` window per ``.npz``
file with ``t, x, y, p`` arrays.

Re-design: the reference finds each window boundary with a linear
``np.where`` scan per frame (O(frames * events)); here boundaries come from
one vectorized ``np.searchsorted`` over the sorted timestamps. A C++ decoder
(``v2e2v_tpu.runtime``) accelerates the text parse when available.
"""

from __future__ import annotations

import os
from os.path import splitext

import numpy as np


def read_events_table(path: str) -> np.ndarray:
    """Load a whitespace-separated ``[t x y p]`` event table (.txt/.csv/.zip).

    Returns float64 ``[N, 4]``. Uses the native C++ parser when built,
    otherwise pandas' C engine.
    """
    try:
        from ..runtime import parse_events_txt  # C++ fast path

        if splitext(path)[1] in (".txt", ".csv"):
            return parse_events_txt(path)
    except Exception:
        pass

    import pandas as pd

    df = pd.read_csv(
        path,
        delimiter=" ",
        names=["t", "x", "y", "p"],
        dtype={"t": np.float64, "x": np.int16, "y": np.int16, "p": np.int16},
        engine="c",
        index_col=False,
    )
    return df.values.astype(np.float64)


class RefTimeEventReader:
    """Iterate event windows between consecutive reference image timestamps.

    Matches the reference reader's semantics: event and image times are
    rebased by ``T_image[0]``; window ``i`` covers ``[T_image[i],
    T_image[i+1])``; events before the first image timestamp are folded into
    no window (boundary indices are first-`>=` positions).
    """

    def __init__(self, path_to_event_file: str, t_image):
        assert splitext(path_to_event_file)[1] in (".txt", ".csv", ".zip")
        table = read_events_table(path_to_event_file)
        t_image = np.asarray(t_image, dtype=np.float64)
        self.t0 = t_image[0]
        self._events = table
        self._events[:, 0] -= self.t0

        rel_image_times = t_image - self.t0
        ts = self._events[:, 0]
        bounds = np.searchsorted(ts, rel_image_times, side="left")
        # reference quirk: when no event is >= t, it points at the LAST event
        bounds = np.where(bounds >= len(ts), max(len(ts) - 1, 0), bounds)
        self._bounds = bounds.astype(np.int64)
        self._frame_id = 0

    def __iter__(self):
        return self

    def __len__(self):
        return max(len(self._bounds) - 1, 0)

    def __next__(self) -> np.ndarray:
        if self._frame_id >= len(self):
            raise StopIteration
        lo = self._bounds[self._frame_id]
        hi = self._bounds[self._frame_id + 1]
        self._frame_id += 1
        return self._events[lo:hi].copy()


class NpzEventReader:
    """Iterate per-interval ``.npz`` event files with ``t, x, y, p`` arrays."""

    def __init__(self, paths: list[str]):
        self._paths = list(paths)
        self._frame_id = 0

    def __iter__(self):
        return self

    def __len__(self):
        return len(self._paths)

    def __next__(self) -> np.ndarray:
        if self._frame_id >= len(self._paths):
            raise StopIteration
        data = np.load(self._paths[self._frame_id])
        self._frame_id += 1
        return np.stack(
            (data["t"], data["x"], data["y"], data["p"]), axis=1
        ).astype(np.float64)
