"""On-demand native builds + ctypes bindings.

g++ compiles the .cpp sources into per-version .so files under a cache dir
the first time they are needed; everything degrades gracefully to the
pure-Python implementations when no toolchain is available.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from functools import lru_cache
from typing import Optional

import numpy as np

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))


def _build(src_name: str) -> Optional[str]:
    src = os.path.join(_SRC_DIR, src_name)
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get(
        "HYVIDEO_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "hyvideo_native"))
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, f"{os.path.splitext(src_name)[0]}-{digest}.so")
    if os.path.exists(so):
        return so
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", so, src,
           "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return so
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


class MetricsCore:
    """ctypes wrapper over metrics_core.cpp."""

    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f8p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        for name in ("psnr_frames", "ssim_frames"):
            fn = getattr(lib, name)
            fn.argtypes = [u8p, u8p, ctypes.c_int, ctypes.c_int,
                           ctypes.c_int, ctypes.c_int, ctypes.c_double, f8p]
            fn.restype = None

    def _call(self, name: str, a: np.ndarray, b: np.ndarray,
              data_range: float) -> np.ndarray:
        a = np.ascontiguousarray(a, np.uint8)
        b = np.ascontiguousarray(b, np.uint8)
        assert a.shape == b.shape and a.ndim == 4, (a.shape, b.shape)
        t, h, w, c = a.shape
        out = np.empty(t, np.float64)
        getattr(self._lib, name)(a, b, t, h, w, c, float(data_range), out)
        return out

    def psnr_frames(self, a, b, data_range=255.0):
        return self._call("psnr_frames", a, b, data_range)

    def ssim_frames(self, a, b, data_range=255.0):
        return self._call("ssim_frames", a, b, data_range)


@lru_cache(maxsize=1)
def load_metrics_core() -> Optional[MetricsCore]:
    """Build+load the native metrics core; None when unavailable."""
    so = _build("metrics_core.cpp")
    if so is None:
        return None
    try:
        return MetricsCore(ctypes.CDLL(so))
    except OSError:
        return None
