"""ctypes bindings for the native C++ oracle (see src/icp_oracle.cpp).

The library is built on demand with build.sh (g++ only; no external deps).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "lib", "libicp_oracle.so")
_lib = None


def build() -> None:
    subprocess.run(["sh", os.path.join(_DIR, "build.sh")], check=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        build()
    lib = ctypes.CDLL(_LIB_PATH)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.estimate_transform_c.argtypes = [dp, dp, ctypes.c_int64, dp]
    for name in ("icp2d_estimate", "icp3d_estimate"):
        getattr(lib, name).argtypes = [
            dp, ctypes.c_int64, dp, ctypes.c_int64, dp, ctypes.c_int64, dp,
        ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


IDENTITY_RT = np.array([1.0, 0.0, 0.0, 1.0, 0.0, 0.0])


def rt_to_matrices(rt: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    return rt[:4].reshape(2, 2), rt[4:6]


def estimate_transform(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(src, dtype=np.float64)
    dst = np.ascontiguousarray(dst, dtype=np.float64)
    out = np.empty(6)
    lib.estimate_transform_c(_ptr(src), _ptr(dst), len(src), _ptr(out))
    return out


def icp2d_estimate(
    src: np.ndarray, dst: np.ndarray, init_rt: np.ndarray = IDENTITY_RT,
    max_iter: int = 20,
) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(src, dtype=np.float64)
    dst = np.ascontiguousarray(dst, dtype=np.float64)
    init = np.ascontiguousarray(init_rt, dtype=np.float64)
    out = np.empty(6)
    lib.icp2d_estimate(
        _ptr(src), len(src), _ptr(dst), len(dst), _ptr(init), max_iter,
        _ptr(out),
    )
    return out


def icp3d_estimate(
    src: np.ndarray, dst: np.ndarray, init_rt: np.ndarray = IDENTITY_RT,
    max_iter: int = 20,
) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(src, dtype=np.float64)
    dst = np.ascontiguousarray(dst, dtype=np.float64)
    init = np.ascontiguousarray(init_rt, dtype=np.float64)
    out = np.empty(6)
    lib.icp3d_estimate(
        _ptr(src), len(src), _ptr(dst), len(dst), _ptr(init), max_iter,
        _ptr(out),
    )
    return out


def _inverse_t(rt: np.ndarray) -> np.ndarray:
    rot, t = rt_to_matrices(rt)
    return -(rot.T @ t)


def run_odometry2d(frames: List[np.ndarray], max_iter: int = 20):
    """reference examples/scan2d.rs flow on the native oracle."""
    src = np.ascontiguousarray(frames[0], dtype=np.float64)
    rt = IDENTITY_RT.copy()
    rts, path = [], []
    for dst in frames[1:]:
        rt = icp2d_estimate(src, dst, rt, max_iter)
        rts.append(rt)
        path.append(_inverse_t(rt))
    return rts, np.asarray(path)


def run_odometry3d(frames: List[np.ndarray], max_iter: int = 20):
    src = np.ascontiguousarray(frames[0], dtype=np.float64)
    rt = IDENTITY_RT.copy()
    rts, path = [], []
    for dst in frames[1:]:
        rt = icp3d_estimate(src, dst, rt, max_iter)
        rts.append(rt)
        path.append(_inverse_t(rt))
    return rts, np.asarray(path)
