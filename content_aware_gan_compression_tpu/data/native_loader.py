"""ctypes bindings + on-demand build of the native batch image transform.

Compiles data/native/transform.cpp with g++ at first use (cached under
~/.cache/cagc_native, keyed by source hash) and exposes
`transform_batch(images_u8, out_size, flips)`. Returns None handles and
falls back to the numpy/PIL path if no toolchain is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(os.path.dirname(__file__), "native", "transform.cpp")


def _build() -> str | None:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.path.join(
        os.path.expanduser("~"), ".cache", "cagc_native")
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"transform_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           _SRC, "-o", so_path + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(so_path + ".tmp", so_path)
        return so_path
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return None


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so_path = _build()
        if so_path is None:
            return None
        lib = ctypes.CDLL(so_path)
        lib.cagc_transform_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.cagc_transform_batch.restype = None
        _lib = lib
        return _lib


def transform_batch(images_u8: np.ndarray, out_size: int,
                    flips: np.ndarray, num_threads: int = 8):
    """[N, H, W, 3] uint8 -> [N, 3, out, out] float32 in [-1, 1], with
    per-image horizontal flips. Returns None if the native lib is
    unavailable (caller falls back)."""
    lib = get_lib()
    if lib is None:
        return None
    images_u8 = np.ascontiguousarray(images_u8, dtype=np.uint8)
    flips = np.ascontiguousarray(flips, dtype=np.uint8)
    n, h, w, c = images_u8.shape
    assert c == 3
    out = np.empty((n, 3, out_size, out_size), dtype=np.float32)
    lib.cagc_transform_batch(
        images_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, out_size,
        flips.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads)
    return out
