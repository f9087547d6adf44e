"""Native (C++) host-side kernels with transparent build + scipy fallback.

The reference leans on binary deps (lap, scipy LAPACK, OpenCV — SURVEY
§2.6); the first-party native layer here is built from ``native/*.cpp`` at
first use (g++ -O3, cached next to the sources) and exposed through
ctypes. Every entry point has a pure-scipy fallback so the package works
without a toolchain.
"""
from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)

__all__ = ["linear_sum_assignment", "lapjv_available"]

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = _NATIVE_DIR / "lapjv.cpp"
    if not src.exists():
        return None
    # The artifact is keyed on the source content hash and never committed
    # (binaries built with -march=native are machine-specific; a foreign
    # .so could SIGILL): a fresh clone always rebuilds on first use.
    import hashlib
    digest = hashlib.sha256(src.read_bytes()).hexdigest()[:12]
    so = _NATIVE_DIR / f"liblapjv-{digest}.so"
    try:
        if not so.exists():
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 str(src), "-o", str(so)],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(so))
        lib.lapjv_square.restype = ctypes.c_int
        lib.lapjv_square.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32)]
        lib.lapjv_batch.restype = ctypes.c_int
        lib.lapjv_batch.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
        _LIB = lib
        log.debug("native lapjv loaded from %s", so)
    except (subprocess.SubprocessError, OSError) as e:
        log.info("native lapjv unavailable (%s); using scipy", e)
        _LIB = None
    return _LIB


def lapjv_available() -> bool:
    return _build_and_load() is not None


def linear_sum_assignment(cost: np.ndarray):
    """scipy-compatible exact LSA (rows, cols), native when possible."""
    cost = np.asarray(cost, np.float64)
    n, m = cost.shape
    lib = _build_and_load()
    if lib is None or n == 0 or m == 0 or not np.isfinite(cost).all():
        from scipy.optimize import linear_sum_assignment as scipy_lsa
        return scipy_lsa(cost)
    k = max(n, m)
    if n != m:
        sq = np.zeros((k, k), np.float64)
        # pad with a row/col-constant that can't change the valid optimum
        sq[:] = 0.0
        sq[:n, :m] = cost - cost.min()
    else:
        sq = np.ascontiguousarray(cost)
    row2col = np.empty(k, np.int32)
    rc = lib.lapjv_square(
        sq.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int32(k),
        row2col.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        from scipy.optimize import linear_sum_assignment as scipy_lsa
        return scipy_lsa(cost)
    rows = np.arange(n)
    cols = row2col[:n]
    keep = cols < m
    return rows[keep], cols[keep]
