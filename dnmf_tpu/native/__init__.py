"""Native (C++) host-runtime pieces, built lazily with the system
toolchain and bound via ctypes.

The TPU compute path is JAX/XLA/Pallas; these components cover the
host-side runtime around it — currently the threaded prefetching block
reader that feeds host-streamed recordings (the role the reference's
multiprocessing pool played for chunk IO,
``/root/reference/Demix/MotionCorrect.py:2101-2117``).

Everything degrades gracefully: if no compiler is available the callers
fall back to the pure-NumPy paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_SRC = os.path.join(os.path.dirname(__file__), "blockreader.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "_blockreader.so")
_lock = threading.Lock()
_lib_cache: Optional[object] = None
_load_failed = False


def _build() -> bool:
    """Compile the shared library if missing or stale; True on success."""
    try:
        if (os.path.exists(_LIB)
                and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
            return True
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
            _SRC, "-o", _LIB,
        ]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_blockreader():
    """Load (building if needed) the block-reader library, or None."""
    global _lib_cache, _load_failed
    with _lock:
        if _lib_cache is not None:
            return _lib_cache
        if _load_failed:
            return None
        if not _build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _load_failed = True
            return None
        lib.br_open.restype = ctypes.c_void_p
        lib.br_open.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                ctypes.c_int64, ctypes.c_int]
        lib.br_close.argtypes = [ctypes.c_void_p]
        lib.br_read.restype = ctypes.c_int
        lib.br_read.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                ctypes.c_int64,
                                ctypes.POINTER(ctypes.c_float)]
        lib.br_prefetch.restype = ctypes.c_int
        lib.br_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_int64]
        lib.br_wait.restype = ctypes.c_int64
        lib.br_wait.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.c_int64]
        lib.br_wait_range.restype = ctypes.c_int64
        lib.br_wait_range.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                      ctypes.c_int64,
                                      ctypes.POINTER(ctypes.c_float),
                                      ctypes.c_int64]
        _lib_cache = lib
        return lib


class BlockReader:
    """Threaded reader over a raw float32 ``[T, P]`` file.

    ``read`` is a synchronous multithreaded read+clamp;
    ``prefetch``/``wait`` overlap the next block's IO with device
    compute (one request in flight).
    """

    def __init__(self, path: str, num_frames: int, frame_floats: int,
                 num_threads: int = 4):
        import numpy as np

        lib = load_blockreader()
        if lib is None:
            raise RuntimeError("native block reader unavailable "
                               "(no compiler?)")
        self._lib = lib
        self._np = np
        self.num_frames = int(num_frames)
        self.frame_floats = int(frame_floats)
        self._h = lib.br_open(path.encode(), self.num_frames,
                              self.frame_floats, int(num_threads))
        if not self._h:
            raise OSError(f"cannot open {path}")

    def read(self, start: int, stop: int):
        np = self._np
        out = np.empty((stop - start) * self.frame_floats,
                       dtype=np.float32)
        rc = self._lib.br_read(
            self._h, start, stop,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise OSError(f"br_read failed (rc={rc})")
        return out.reshape(stop - start, self.frame_floats)

    def prefetch(self, start: int, stop: int) -> None:
        rc = self._lib.br_prefetch(self._h, start, stop)
        if rc != 0:
            raise OSError(f"br_prefetch failed (rc={rc})")

    def wait(self, start: int, stop: int):
        np = self._np
        n = (stop - start) * self.frame_floats
        out = np.empty(n, dtype=np.float32)
        got = self._lib.br_wait_range(
            self._h, start, stop,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n
        )
        if got == -2:
            raise ValueError(
                f"wait({start}, {stop}) does not match the in-flight "
                "prefetch request"
            )
        if got != n:
            raise OSError(f"br_wait returned {got}, expected {n}")
        return out.reshape(stop - start, self.frame_floats)

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.br_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
