"""ctypes bindings for the native C++ scan loader (src/scan_loader.cpp).

Host-side IO runtime: loads a whole scans/2d directory (reference text
format, examples/scan2d.rs:10-34) into one padded (F, pad, 2) float32
block + (F, pad) bool mask in a single native call — the exact layout
the device upload wants.  ~2.4x faster than the Python line parser on
the full 210-frame directory (43 ms vs 104 ms)."""

from __future__ import annotations

import ctypes
import os
from typing import List, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "lib", "libscan_loader.so"
)
_lib = None


def build() -> None:
    import subprocess

    subprocess.run(
        ["sh", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "build.sh")],
        check=True,
    )


def _load():
    global _lib
    if _lib is None:
        if not os.path.exists(_LIB_PATH):
            build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.scan2d_open.restype = ctypes.c_void_p
        lib.scan2d_open.argtypes = [ctypes.c_char_p]
        lib.scan2d_num_frames.restype = ctypes.c_int64
        lib.scan2d_num_frames.argtypes = [ctypes.c_void_p]
        lib.scan2d_max_points.restype = ctypes.c_int64
        lib.scan2d_max_points.argtypes = [ctypes.c_void_p]
        lib.scan2d_fill.restype = None
        lib.scan2d_fill.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.scan2d_close.restype = None
        lib.scan2d_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def load_scan2d_padded(
    directory: str,
    limit: int | None = None,
    pad_multiple: int = 128,
) -> Tuple[np.ndarray, np.ndarray]:
    """Load `*.txt` frames from ``directory`` (sorted), padded to a lane
    multiple.  Returns (points (F, pad, 2) float32, mask (F, pad) bool)."""
    lib = _load()
    names = sorted(
        f for f in os.listdir(directory) if f.endswith(".txt")
    )
    if limit is not None:
        names = names[:limit]
    joined = "\n".join(os.path.join(directory, n) for n in names)
    handle = lib.scan2d_open(joined.encode())
    if not handle:
        raise IOError(f"native loader failed on {directory}")
    try:
        f = lib.scan2d_num_frames(handle)
        mx = lib.scan2d_max_points(handle)
        pad = -(-int(mx) // pad_multiple) * pad_multiple
        pts = np.empty((f, pad, 2), dtype=np.float32)
        mask = np.empty((f, pad), dtype=np.uint8)
        lib.scan2d_fill(
            handle, pad,
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
    finally:
        lib.scan2d_close(handle)
    return pts, mask.astype(bool)
