"""ctypes wrapper over the native frame ring (native/frame_ring.cpp).

The host↔device "ABI" of the framework (SURVEY §5 communication-backend
mapping): producers push raw RGBA/gray bytes, the native code converts to
grayscale float32 (the reference's cv::cvtColor pass, system.cpp:111-112),
and the consumer maps ring slots zero-copy as numpy arrays to upload to
the TPU.  Builds the shared library on first use if missing (g++ -O3)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libframering.so"


def _load_lib() -> ctypes.CDLL:
    if not _LIB_PATH.exists():
        subprocess.run(["make", "-s"], cwd=_NATIVE_DIR, check=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.fr_create.restype = ctypes.c_void_p
    lib.fr_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.fr_destroy.argtypes = [ctypes.c_void_p]
    lib.fr_capacity.argtypes = [ctypes.c_void_p]
    lib.fr_capacity.restype = ctypes.c_int
    lib.fr_count.argtypes = [ctypes.c_void_p]
    lib.fr_count.restype = ctypes.c_longlong
    lib.fr_push_rgba.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_double]
    lib.fr_push_rgba.restype = ctypes.c_longlong
    lib.fr_push_gray_u8.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_double]
    lib.fr_push_gray_u8.restype = ctypes.c_longlong
    lib.fr_front.argtypes = [ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_double)]
    lib.fr_front.restype = ctypes.POINTER(ctypes.c_float)
    lib.fr_release.argtypes = [ctypes.c_void_p]
    lib.fr_release.restype = ctypes.c_int
    return lib


_lib: Optional[ctypes.CDLL] = None


class FrameRing:
    """Bounded ring of grayscale float32 frames with native pixel prep."""

    def __init__(self, width: int, height: int, capacity: int = 8):
        global _lib
        if _lib is None:
            _lib = _load_lib()
        self._lib = _lib
        self.width = width
        self.height = height
        self._h = self._lib.fr_create(width, height, capacity)
        if not self._h:
            raise MemoryError("frame ring allocation failed")

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.fr_destroy(h)
            self._h = None

    def __len__(self) -> int:
        return int(self._lib.fr_count(self._h))

    @property
    def capacity(self) -> int:
        return int(self._lib.fr_capacity(self._h))

    def push_rgba(self, rgba: np.ndarray, timestamp: float = 0.0) -> int:
        """Push an [H, W, 4] uint8 frame; RGBA→gray runs natively.
        Returns the sequence number or -1 if the ring is full."""
        rgba = np.ascontiguousarray(rgba, np.uint8)
        assert rgba.shape == (self.height, self.width, 4)
        return int(self._lib.fr_push_rgba(
            self._h, rgba.ctypes.data_as(ctypes.c_void_p), timestamp))

    def push_gray(self, gray: np.ndarray, timestamp: float = 0.0) -> int:
        gray = np.ascontiguousarray(gray, np.uint8)
        assert gray.shape == (self.height, self.width)
        return int(self._lib.fr_push_gray_u8(
            self._h, gray.ctypes.data_as(ctypes.c_void_p), timestamp))

    def front(self) -> Optional[Tuple[np.ndarray, float]]:
        """Zero-copy view of the oldest frame + its timestamp, or None.
        The view is valid until release()."""
        ts = ctypes.c_double()
        ptr = self._lib.fr_front(self._h, ctypes.byref(ts))
        if not ptr:
            return None
        arr = np.ctypeslib.as_array(ptr, shape=(self.height, self.width))
        return arr, float(ts.value)

    def release(self) -> bool:
        return bool(self._lib.fr_release(self._h))
