"""ctypes bindings for the native runtime library (libflowio.so).

Provides fast .flo I/O, PNG/JPEG/PPM decode to float32 BGR, flow
colorization, and a threaded frame-stream prefetcher — the C++ runtime
layer mirroring the reference's OpenCV-based host path
(src/run_dense.cpp:137-162).  Falls back to the pure-Python ``io``
implementations when the library isn't built; ``ensure_built`` compiles
it with the in-tree Makefile.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libflowio.so"))
_lib: Optional[ctypes.CDLL] = None


def ensure_built(quiet: bool = True) -> bool:
    """Build libflowio.so if missing. Returns True if available."""
    if os.path.exists(_LIB_PATH):
        return True
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=quiet)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    return os.path.exists(_LIB_PATH)


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not ensure_built():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    c_int_p = ctypes.POINTER(ctypes.c_int)
    f32_p = ctypes.POINTER(ctypes.c_float)
    u8_p = ctypes.POINTER(ctypes.c_uint8)

    lib.flo_read.argtypes = [ctypes.c_char_p, c_int_p, c_int_p, f32_p]
    lib.flo_read.restype = ctypes.c_int
    lib.flo_write.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                              f32_p]
    lib.flo_write.restype = ctypes.c_int
    lib.image_read_bgr32f.argtypes = [ctypes.c_char_p, c_int_p, c_int_p, f32_p]
    lib.image_read_bgr32f.restype = ctypes.c_int
    lib.flow_to_color_rgb.argtypes = [f32_p, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_float, u8_p]
    lib.flow_to_color_rgb.restype = None
    lib.stream_open.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                                ctypes.c_int, ctypes.c_int]
    lib.stream_open.restype = ctypes.c_void_p
    lib.stream_next.argtypes = [ctypes.c_void_p, c_int_p, c_int_p, f32_p,
                                ctypes.c_long]
    lib.stream_next.restype = ctypes.c_int
    lib.stream_close.argtypes = [ctypes.c_void_p]
    lib.stream_close.restype = None
    _lib = lib
    return _lib


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def read_flo_native(path: str) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        from .flo import read_flo
        return read_flo(path)
    w, h = ctypes.c_int(), ctypes.c_int()
    rc = lib.flo_read(path.encode(), ctypes.byref(w), ctypes.byref(h), None)
    if rc != 0:
        raise IOError(f"flo_read({path}) failed: {rc}")
    out = np.empty((h.value, w.value, 2), np.float32)
    rc = lib.flo_read(path.encode(), ctypes.byref(w), ctypes.byref(h),
                      _f32p(out))
    if rc != 0:
        raise IOError(f"flo_read({path}) failed: {rc}")
    return out


def write_flo_native(path: str, flow: np.ndarray) -> None:
    lib = get_lib()
    if lib is None:
        from .flo import write_flo
        return write_flo(path, flow)
    flow = np.ascontiguousarray(flow, np.float32)
    h, w = flow.shape[:2]
    rc = lib.flo_write(path.encode(), w, h, _f32p(flow))
    if rc != 0:
        raise IOError(f"flo_write({path}) failed: {rc}")


def load_image_native(path: str) -> np.ndarray:
    """float32 BGR [H, W, 3], 0..255 — cv::imread-compatible numerics."""
    lib = get_lib()
    if lib is None:
        from .images import load_image
        return load_image(path)
    w, h = ctypes.c_int(), ctypes.c_int()
    rc = lib.image_read_bgr32f(path.encode(), ctypes.byref(w),
                               ctypes.byref(h), None)
    if rc != 0:
        raise IOError(f"image_read({path}) failed: {rc}")
    out = np.empty((h.value, w.value, 3), np.float32)
    rc = lib.image_read_bgr32f(path.encode(), ctypes.byref(w),
                               ctypes.byref(h), _f32p(out))
    if rc != 0:
        raise IOError(f"image_read({path}) failed: {rc}")
    return out


def flow_to_color_native(flow: np.ndarray,
                         max_motion: float = 0.0) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        from .color import flow_to_color
        return flow_to_color(flow, max_motion or None)
    flow = np.ascontiguousarray(flow, np.float32)
    h, w = flow.shape[:2]
    out = np.empty((h, w, 3), np.uint8)
    lib.flow_to_color_rgb(_f32p(flow), w, h, float(max_motion),
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


class FrameStream:
    """Iterate decoded frames with background prefetch (native threads)."""

    def __init__(self, paths: Sequence[str], n_threads: int = 2,
                 read_ahead: int = 8, max_pixels: int = 4096 * 2176):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._handle = lib.stream_open(arr, len(paths), n_threads, read_ahead)
        self._buf = np.empty(max_pixels * 3, np.float32)

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        w, h = ctypes.c_int(), ctypes.c_int()
        rc = self._lib.stream_next(self._handle, ctypes.byref(w),
                                   ctypes.byref(h), _f32p(self._buf),
                                   self._buf.size)
        if rc == -99:
            raise StopIteration
        if rc != 0:
            raise IOError(f"stream_next failed: {rc}")
        n = h.value * w.value * 3
        return self._buf[:n].reshape(h.value, w.value, 3).copy()

    def close(self):
        if self._handle:
            self._lib.stream_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
