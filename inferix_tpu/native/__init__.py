"""ctypes bindings for the native runtime components (frame_pipe.cpp).

Compiles on first import with g++ (cached next to the source); every entry
point has a numpy fallback so the package works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "src", "frame_pipe.cpp")
_SO = os.path.join(_HERE, "_frame_pipe.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if _build_failed:
        return None
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 _SRC, "-o", _SO],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.fp_create.restype = ctypes.c_void_p
        lib.fp_create.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
        lib.fp_destroy.argtypes = [ctypes.c_void_p]
        lib.fp_push.restype = ctypes.c_int
        lib.fp_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.fp_pop.restype = ctypes.c_int
        lib.fp_pop.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.fp_size.restype = ctypes.c_size_t
        lib.fp_size.argtypes = [ctypes.c_void_p]
        lib.fp_dropped.restype = ctypes.c_uint64
        lib.fp_dropped.argtypes = [ctypes.c_void_p]
        lib.rgb_to_i420.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_char_p,
                                    ctypes.c_char_p, ctypes.c_char_p]
        lib.laplacian_var.restype = ctypes.c_double
        lib.laplacian_var.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                      ctypes.c_int]
        return lib
    except Exception:
        _build_failed = True
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is None:
            _lib = _build()
        return _lib


def native_available() -> bool:
    return get_lib() is not None


class FramePipe:
    """SPSC frame ring buffer backed by the native library (numpy-deque
    fallback)."""

    def __init__(self, capacity: int, height: int, width: int,
                 channels: int = 3):
        self.shape = (height, width, channels)
        self.frame_bytes = height * width * channels
        self.capacity = capacity
        self._lib = get_lib()
        if self._lib is not None:
            self._ptr = self._lib.fp_create(capacity, self.frame_bytes)
            self._fallback = None
        else:
            import collections

            self._ptr = None
            self._fallback = collections.deque(maxlen=capacity)
            self._dropped = 0

    def push(self, frame: np.ndarray) -> bool:
        frame = np.ascontiguousarray(frame, np.uint8)
        assert frame.nbytes == self.frame_bytes, (frame.shape, self.shape)
        if self._ptr is not None:
            return bool(self._lib.fp_push(self._ptr, frame.tobytes()))
        if len(self._fallback) >= self.capacity:
            self._dropped += 1
            return False
        self._fallback.append(frame.copy())
        return True

    def pop(self) -> Optional[np.ndarray]:
        if self._ptr is not None:
            out = ctypes.create_string_buffer(self.frame_bytes)
            if not self._lib.fp_pop(self._ptr, out):
                return None
            return np.frombuffer(out.raw, np.uint8).reshape(self.shape).copy()
        if not self._fallback:
            return None
        return self._fallback.popleft()

    def __len__(self) -> int:
        if self._ptr is not None:
            return int(self._lib.fp_size(self._ptr))
        return len(self._fallback)

    @property
    def dropped(self) -> int:
        if self._ptr is not None:
            return int(self._lib.fp_dropped(self._ptr))
        return self._dropped

    def __del__(self):
        if getattr(self, "_ptr", None) is not None and self._lib is not None:
            self._lib.fp_destroy(self._ptr)
            self._ptr = None


def rgb_to_i420(frame: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """[H, W, 3] uint8 -> (Y [H,W], U [H/2,W/2], V [H/2,W/2])."""
    h, w, _ = frame.shape
    lib = get_lib()
    if lib is not None:
        y = ctypes.create_string_buffer(h * w)
        u = ctypes.create_string_buffer((h // 2) * (w // 2))
        v = ctypes.create_string_buffer((h // 2) * (w // 2))
        lib.rgb_to_i420(np.ascontiguousarray(frame, np.uint8).tobytes(),
                        w, h, y, u, v)
        return (
            np.frombuffer(y.raw, np.uint8).reshape(h, w).copy(),
            np.frombuffer(u.raw, np.uint8).reshape(h // 2, w // 2).copy(),
            np.frombuffer(v.raw, np.uint8).reshape(h // 2, w // 2).copy(),
        )
    # numpy fallback (same integer math)
    f = frame.astype(np.int32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = np.clip((77 * r + 150 * g + 29 * b) >> 8, 0, 255).astype(np.uint8)
    blk = f.reshape(h // 2, 2, w // 2, 2, 3).mean(axis=(1, 3)).astype(np.int32)
    rb, gb, bb = blk[..., 0], blk[..., 1], blk[..., 2]
    u = np.clip(((-43 * rb - 85 * gb + 128 * bb) >> 8) + 128, 0, 255).astype(np.uint8)
    v = np.clip(((128 * rb - 107 * gb - 21 * bb) >> 8) + 128, 0, 255).astype(np.uint8)
    return y, u, v


def laplacian_var(frame: np.ndarray) -> float:
    """Sharpness of an RGB uint8 frame (native fast path)."""
    h, w, _ = frame.shape
    lib = get_lib()
    if lib is not None:
        return float(lib.laplacian_var(
            np.ascontiguousarray(frame, np.uint8).tobytes(), w, h))
    gray = (0.299 * frame[..., 0] + 0.587 * frame[..., 1]
            + 0.114 * frame[..., 2]).astype(np.float64)
    lap = (gray[:-2, 1:-1] + gray[2:, 1:-1] + gray[1:-1, :-2]
           + gray[1:-1, 2:] - 4 * gray[1:-1, 1:-1])
    return float(lap.var())
