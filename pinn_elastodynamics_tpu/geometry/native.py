"""ctypes bindings for the native (C++/OpenMP) point-generation library.

``native/libpointgen.so`` accelerates the host-side data layer (LHS sampling,
disk filtering, distance targets, time cross-products) for 1M+ point banks;
the numpy implementations in ``sampling.py``/``distance.py`` define the
semantics and remain the fallback when the library isn't built
(``make -C native``).

The native LHS uses its own deterministic RNG (xoshiro256**), so values
differ from numpy's Generator stream; both satisfy the same Latin-hypercube
stratification contract (tested in tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libpointgen.so"),
    os.path.join(os.path.dirname(__file__), "libpointgen.so"),
)

_lib: Optional[ctypes.CDLL] = None
_load_error: Optional[str] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    for path in _LIB_PATHS:
        path = os.path.abspath(path)
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
            except OSError as e:  # built for another arch, missing omp, ...
                _load_error = str(e)
                return None
            _configure(lib)
            _lib = lib
            return _lib
    _load_error = "libpointgen.so not built (run `make -C native`)"
    return None


def _configure(lib: ctypes.CDLL) -> None:
    d = ctypes.POINTER(ctypes.c_double)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    lib.pg_lhs.argtypes = [ctypes.c_int64, ctypes.c_int32, ctypes.c_uint64, d]
    lib.pg_scale_box.argtypes = [ctypes.c_int64, ctypes.c_int32, d, d, d]
    lib.pg_disk_keep_mask.argtypes = [
        ctypes.c_int64, ctypes.c_int32, d, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_int32, u8,
    ]
    lib.pg_disk_keep_mask.restype = ctypes.c_int64
    lib.pg_plate_hole_distance.argtypes = [ctypes.c_int64, d, d]
    lib.pg_cross_time.argtypes = [
        ctypes.c_int64, ctypes.c_int32, d, ctypes.c_int64, d, d,
    ]
    lib.pg_num_threads.restype = ctypes.c_int32


def available() -> bool:
    return _load() is not None


def load_error() -> Optional[str]:
    _load()
    return _load_error


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def lhs(n_dims: int, n_samples: int, seed: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    out = np.empty((n_samples, n_dims), dtype=np.float64)
    lib.pg_lhs(n_samples, n_dims, seed & 0xFFFFFFFFFFFFFFFF, _dp(out))
    return out


def lhs_box(
    lb: Sequence[float], ub: Sequence[float], n: int, seed: int
) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    lb = np.ascontiguousarray(lb, dtype=np.float64)
    ub = np.ascontiguousarray(ub, dtype=np.float64)
    pts = lhs(len(lb), n, seed)
    lib.pg_scale_box(n, len(lb), _dp(lb), _dp(ub), _dp(pts))
    return pts


def exclude_disk(
    pts: np.ndarray, *, xc: float, yc: float, r: float, strict: bool = False
) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    pts = np.ascontiguousarray(pts, dtype=np.float64)
    keep = np.empty(pts.shape[0], dtype=np.uint8)
    lib.pg_disk_keep_mask(
        pts.shape[0], pts.shape[1], _dp(pts), xc, yc, r, int(strict),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return pts[keep.astype(bool)]


def plate_hole_distance(xyt: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    xyt = np.ascontiguousarray(xyt, dtype=np.float64)
    out = np.empty((xyt.shape[0], 5), dtype=np.float64)
    lib.pg_plate_hole_distance(xyt.shape[0], _dp(xyt), _dp(out))
    return out


def cross_time(xy: np.ndarray, t: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    xy = np.ascontiguousarray(xy, dtype=np.float64)
    t = np.ascontiguousarray(t, dtype=np.float64)
    out = np.empty((xy.shape[0] * t.shape[0], xy.shape[1] + 1), np.float64)
    lib.pg_cross_time(
        xy.shape[0], xy.shape[1], _dp(xy), t.shape[0], _dp(t), _dp(out)
    )
    return out


def num_threads() -> int:
    lib = _load()
    return int(lib.pg_num_threads()) if lib else 0
