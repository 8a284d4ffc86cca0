"""ctypes binding for the native fused batch gather (gather.cpp).

`gather_multi(arrays, idx)` gathers the same row indices from several
float32 2-D arrays in one fused pass.  Falls back to numpy fancy indexing
when the shared library hasn't been built (build with
`make -C mipnerf_pl_tpu/native`, or let `_ensure_built` compile it once —
g++ is part of this image's toolchain).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, 'libgather.so')
_lib = None
_tried = False


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ['g++', '-O3', '-march=native', '-shared', '-fPIC',
                 '-std=c++17', '-pthread', '-o', _SO,
                 os.path.join(_DIR, 'gather.cpp')],
                check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.gather_multi_f32.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int]
        lib.gather_rows_f32.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def native_available() -> bool:
    return _ensure_built() is not None


def gather_multi(arrays: Sequence[np.ndarray], idx: np.ndarray,
                 n_threads: Optional[int] = None) -> List[np.ndarray]:
    """dsts[f] = arrays[f][idx] for all f, fused when the native lib exists.

    Args:
      arrays: list of contiguous float32 [N, W_f] arrays.
      idx: int64 [M] row indices.
    """
    lib = _ensure_built()
    usable = lib is not None and all(
        a.dtype == np.float32 and a.flags['C_CONTIGUOUS'] and a.ndim == 2
        for a in arrays)
    if not usable:
        return [a[idx] for a in arrays]

    idx = np.ascontiguousarray(idx, dtype=np.int64)
    n_idx = idx.shape[0]
    outs = [np.empty((n_idx, a.shape[1]), np.float32) for a in arrays]
    n = len(arrays)
    srcs = (ctypes.c_void_p * n)(*[a.ctypes.data for a in arrays])
    dsts = (ctypes.c_void_p * n)(*[o.ctypes.data for o in outs])
    widths = (ctypes.c_int64 * n)(*[a.shape[1] for a in arrays])
    if n_threads is None:
        n_threads = min(4, os.cpu_count() or 1)
    lib.gather_multi_f32(
        ctypes.cast(srcs, ctypes.POINTER(ctypes.c_void_p)),
        ctypes.cast(dsts, ctypes.POINTER(ctypes.c_void_p)),
        ctypes.cast(widths, ctypes.POINTER(ctypes.c_int64)),
        n,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_idx, int(n_threads))
    return outs
