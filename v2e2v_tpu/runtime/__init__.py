"""Native (C++) data-path runtime, loaded via ctypes.

Builds ``ev_io.cpp`` into ``_ev_io.so`` on first import (g++ -O3); all
callers fall back to the numpy/pandas paths if the toolchain or build is
unavailable, so the framework never hard-depends on the native module.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "ev_io.cpp")
_SO = os.path.join(_DIR, "_ev_io.so")

_lib = None


class NativeUnavailable(RuntimeError):
    pass


def _host_fingerprint() -> str:
    """CPU feature fingerprint: ``-march=native`` binaries are NOT portable
    across the session hosts this repo moves between (a stale .so can
    SIGILL), so the build is keyed to the host's flags line."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return line.strip()
    except OSError:
        pass
    return "unknown"


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO, _SRC],
        check=True,
        capture_output=True,
    )
    with open(_SO + ".host", "w") as f:
        f.write(_host_fingerprint())


def _stale() -> bool:
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        return True
    try:
        with open(_SO + ".host") as f:
            return f.read() != _host_fingerprint()
    except OSError:
        return True


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if _stale():
        _build()
    lib = ctypes.CDLL(_SO)
    lib.ev_parse_txt.restype = ctypes.c_long
    lib.ev_parse_txt.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_double))]
    lib.ev_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
    lib.ev_voxelize.restype = ctypes.c_long
    lib.ev_voxelize.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
    ]
    lib.ev_preprocess_std.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_float,
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def parse_events_txt(path: str) -> np.ndarray:
    """Parse a ``t x y p`` event table into float64 ``[N, 4]``."""
    lib = _load()
    out = ctypes.POINTER(ctypes.c_double)()
    n = lib.ev_parse_txt(path.encode(), ctypes.byref(out))
    if n < 0:
        raise NativeUnavailable(f"native parse failed ({n}) for {path!r}")
    if n == 0:
        return np.zeros((0, 4), np.float64)
    try:
        arr = np.ctypeslib.as_array(out, shape=(n, 4)).copy()
    finally:
        lib.ev_free(out)
    return arr


def voxelize_events(
    events: np.ndarray,
    num_bins: int,
    width: int,
    height: int,
    preprocess: bool = False,
    hot_pixel_threshold: float = 0.0,
) -> np.ndarray:
    """Native events -> voxel grid (reference semantics); optional fused
    hot-pixel filter + nonzero mean/std normalization.

    Raises IndexError when any event coordinate falls outside the grid —
    the same contract as the numpy oracle's ``np.add.at`` (typically an
    ``--image_dim`` that doesn't match the dataset resolution)."""
    lib = _load()
    events = np.ascontiguousarray(events, dtype=np.float64)
    grid = np.empty((num_bins, height, width), np.float32)
    oob = lib.ev_voxelize(
        events.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(events), num_bins, width, height,
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if oob:
        raise IndexError(
            f"{oob}/{len(events)} events outside {width}x{height} — does "
            "--image_dim match the dataset resolution?"
        )
    if preprocess:
        lib.ev_preprocess_std(
            grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            grid.size,
            np.float32(hot_pixel_threshold),
        )
    return grid
