"""Native host-runtime loader: compiles hostops.cpp on first use (ctypes ABI).

Gracefully degrades to numpy implementations when no C++ toolchain is
available; callers use :func:`merge_contact_events` / :func:`quantize_f64`
without caring which backend ran.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

import numpy as np

_HERE = pathlib.Path(__file__).resolve().parent
_SRC = _HERE / "hostops.cpp"
_LIB_PATH = _HERE / "_hostops.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if (not _LIB_PATH.exists()) or (
                _SRC.stat().st_mtime > _LIB_PATH.stat().st_mtime
            ):
                subprocess.run(
                    [
                        "g++", "-O2", "-march=native", "-std=c++17", "-shared",
                        "-fPIC", "-o", str(_LIB_PATH), str(_SRC),
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.gct_quantize_f64.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int,
            ]
            lib.gct_merge_contacts.argtypes = [
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.gct_merge_contacts.restype = ctypes.c_int64
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def quantize_f64(values: np.ndarray, bits: int) -> np.ndarray:
    """Mantissa quantization; native when possible, numpy otherwise."""
    lib = _load()
    out = np.ascontiguousarray(values, dtype=np.float64).copy()
    if lib is not None and out.size:
        lib.gct_quantize_f64(
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out.size,
            bits,
        )
        return out
    mant, exp = np.frexp(out)
    scaled = np.rint(np.ldexp(mant, bits))
    return np.ldexp(scaled, exp - bits)


def merge_contact_events(keys: np.ndarray, weights: np.ndarray):
    """Sum weights of duplicate uint64 keys; returns (sorted unique keys,
    summed counts)."""
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    weights = np.ascontiguousarray(weights, dtype=np.int64)
    n = len(keys)
    lib = _load()
    if lib is not None and n:
        out_keys = np.empty(n, dtype=np.uint64)
        out_counts = np.empty(n, dtype=np.int64)
        m = lib.gct_merge_contacts(
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            weights.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n,
            out_keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            out_counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return out_keys[:m], out_counts[:m]
    uniq, inverse = np.unique(keys, return_inverse=True)
    sums = np.bincount(inverse, weights=weights.astype(np.float64))
    return uniq, np.rint(sums).astype(np.int64)
