"""ctypes bindings for the native host kernels (libscrappie_host.so).

Importing this module builds the library on first use (g++); failures
raise ImportError so callers fall back to the pure-Python ports.
"""

from __future__ import annotations

import ctypes

import numpy as np

try:
    from scrappie_tpu.native.build import build

    _lib = ctypes.CDLL(str(build()))
except Exception as e:  # pragma: no cover - depends on toolchain
    raise ImportError(f"native host kernels unavailable: {e}") from e

_i64 = ctypes.c_int64
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")

_lib.stpu_peak_detector.restype = _i64
_lib.stpu_peak_detector.argtypes = [
    _f32p, _f32p, _i64, ctypes.c_float, ctypes.c_float, _i64, _i64,
    ctypes.c_float, _i64p,
]

_lib.stpu_dwell_overlapper.restype = _i64
_lib.stpu_dwell_overlapper.argtypes = [
    _i32p, _f32p, _i64, ctypes.c_int, ctypes.c_double, _f64p, ctypes.c_char_p,
]

_lib.stpu_find_runs.restype = _i64
_lib.stpu_find_runs.argtypes = [_i32p, _i64, ctypes.c_int, _i64p, _i64p, _i64p]

_lib.stpu_detect_tstat.restype = _i64
_lib.stpu_detect_tstat.argtypes = [
    _f32p, _i64, _i64, _i64, _f64p, _f64p, _f32p, _f32p,
]


def peak_detector(tstat1, tstat2, threshold1, threshold2, window1, window2,
                  peak_height) -> np.ndarray:
    """Peak positions (firing order) zero-padded to signal length,
    matching the reference's output convention."""
    n = len(tstat1)
    out = np.zeros(n, dtype=np.int64)
    count = _lib.stpu_peak_detector(
        np.ascontiguousarray(tstat1, np.float32),
        np.ascontiguousarray(tstat2, np.float32),
        n, threshold1, threshold2, window1, window2, peak_height, out,
    )
    out[count:] = 0
    return out


def dwell_overlapper(path, dwell, klen: int, scale: float,
                     base_adj=(0.0, 0.0, 0.0, 0.0)) -> str | None:
    path = np.ascontiguousarray(path, np.int32)
    n = len(path)
    # Worst case: klen bases per step move plus dwell-derived homopolymer
    # expansions bounded by total_dwell/scale.
    cap = int(klen * (n + 1) + float(np.sum(np.abs(dwell))) / max(scale, 1e-6) + 64)
    buf = ctypes.create_string_buffer(cap)
    ln = _lib.stpu_dwell_overlapper(
        path, np.ascontiguousarray(dwell, np.float32), n, klen, scale,
        np.ascontiguousarray(base_adj, np.float64), buf,
    )
    if ln < 0:
        return None
    return buf.raw[:ln].decode()


def detect_tstat(data, window1: int, window2: int):
    """(sums, sumsqs, tstat1, tstat2): one-pass cumulative statistics
    + both windowed t-statistics, bit-identical to the numpy port
    (signal/events.compute_sum_sumsq + compute_tstat)."""
    data = np.ascontiguousarray(data, np.float32)
    n = len(data)
    sums = np.empty(n + 1, np.float64)
    sumsqs = np.empty(n + 1, np.float64)
    tstat1 = np.empty(n, np.float32)
    tstat2 = np.empty(n, np.float32)
    _lib.stpu_detect_tstat(data, n, window1, window2, sums, sumsqs,
                           tstat1, tstat2)
    return sums, sumsqs, tstat1, tstat2


def find_runs(path, klen: int):
    path = np.ascontiguousarray(path, np.int32)
    n = len(path)
    starts = np.zeros(n, dtype=np.int64)
    lengths = np.zeros(n, dtype=np.int64)
    bases = np.zeros(n, dtype=np.int64)
    count = _lib.stpu_find_runs(path, n, klen, starts, lengths, bases)
    return [(int(starts[i]), int(lengths[i]), int(bases[i])) for i in range(count)]
