"""ctypes wrapper over the native video decoder (native/video_decoder.cpp).

Role-equivalent of the reference's browser video capture feeding the
per-frame loop (reference examples/public/assets/utils.js:112-239 ``Video``
+ examples/public/video.html:148-195): demux + decode + gray conversion
run in native code (FFmpeg libav*); Python sees grayscale uint8 frames and
presentation timestamps, ready for the FrameRing or direct device upload.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Iterator, Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libvideodec.so"


def _load_lib() -> ctypes.CDLL:
    if not _LIB_PATH.exists():
        subprocess.run(["make", "-s", "libvideodec.so"], cwd=_NATIVE_DIR,
                       check=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.vd_open.restype = ctypes.c_void_p
    lib.vd_open.argtypes = [ctypes.c_char_p]
    lib.vd_close.argtypes = [ctypes.c_void_p]
    lib.vd_width.argtypes = [ctypes.c_void_p]
    lib.vd_width.restype = ctypes.c_int
    lib.vd_height.argtypes = [ctypes.c_void_p]
    lib.vd_height.restype = ctypes.c_int
    lib.vd_fps.argtypes = [ctypes.c_void_p]
    lib.vd_fps.restype = ctypes.c_double
    lib.vd_nframes.argtypes = [ctypes.c_void_p]
    lib.vd_nframes.restype = ctypes.c_longlong
    lib.vd_next_gray.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_double)]
    lib.vd_next_gray.restype = ctypes.c_int
    return lib


_lib: Optional[ctypes.CDLL] = None


class VideoReader:
    """Iterate grayscale uint8 frames (+ pts seconds) from a video file."""

    def __init__(self, path: str):
        global _lib
        if _lib is None:
            _lib = _load_lib()
        self._lib = _lib
        self._h = self._lib.vd_open(str(path).encode())
        if not self._h:
            raise IOError(f"cannot open video: {path}")
        self.width = int(self._lib.vd_width(self._h))
        self.height = int(self._lib.vd_height(self._h))
        self.fps = float(self._lib.vd_fps(self._h))
        self.nframes = int(self._lib.vd_nframes(self._h))  # 0 if unknown
        self._last_pts: Optional[float] = None

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.vd_close(self._h)
            self._h = None

    def __del__(self):
        self.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def read(self) -> Optional[Tuple[np.ndarray, float]]:
        """Next (gray [H, W] uint8, pts seconds) or None at end-of-stream."""
        if not self._h:
            return None
        out = np.empty((self.height, self.width), np.uint8)
        pts = ctypes.c_double(-1.0)
        r = self._lib.vd_next_gray(
            self._h, out.ctypes.data_as(ctypes.c_void_p), ctypes.byref(pts))
        if r == 0:
            return None
        if r < 0:
            raise IOError("video decode error")
        # containers with broken edit lists emit garbage/duplicate pts
        # (the reference's own demo mp4 does: ~µs-scale deltas after the
        # first frame); sanitize to a strictly-increasing clock, falling
        # back to the nominal frame interval
        t = float(pts.value)
        step = 1.0 / self.fps if self.fps > 1e-6 else 1.0 / 30.0
        if self._last_pts is not None and t <= self._last_pts + 0.1 * step:
            t = self._last_pts + step
        self._last_pts = t
        return out, t

    def __iter__(self) -> Iterator[Tuple[np.ndarray, float]]:
        while True:
            item = self.read()
            if item is None:
                return
            yield item
