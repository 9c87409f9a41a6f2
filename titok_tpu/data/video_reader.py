"""ctypes wrapper over the first-party libav decoder (native/video_decoder.cpp).

Decord-equivalent API (reference ``dataset/video_dataset.py:66-68``):
``VideoReader(path_or_bytes)`` with ``len()``, ``.fps``, ``.get_batch(idx)``
returning a ``[n, H, W, 3]`` uint8 array. The shared library is built on
first use via ``make -C titok_tpu/native`` if missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtitok_native.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    sources = [os.path.join(_NATIVE_DIR, f)
               for f in ("video_decoder.cpp", "packer.cpp",
                         "frame_resize.cpp", "Makefile")]
    stale = not os.path.exists(_LIB_PATH) or any(
        os.path.exists(s) and os.path.getmtime(s) > os.path.getmtime(_LIB_PATH)
        for s in sources
    )
    if stale:
        subprocess.run(["make", "-B", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.vd_open_file.restype = ctypes.c_void_p
    lib.vd_open_file.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
    lib.vd_open_bytes.restype = ctypes.c_void_p
    lib.vd_open_bytes.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int
    ]
    lib.vd_num_frames.restype = ctypes.c_int64
    lib.vd_num_frames.argtypes = [ctypes.c_void_p]
    lib.vd_fps.restype = ctypes.c_double
    lib.vd_fps.argtypes = [ctypes.c_void_p]
    lib.vd_width.restype = ctypes.c_int
    lib.vd_width.argtypes = [ctypes.c_void_p]
    lib.vd_height.restype = ctypes.c_int
    lib.vd_height.argtypes = [ctypes.c_void_p]
    lib.vd_get_batch.restype = ctypes.c_int
    lib.vd_get_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_char_p, ctypes.c_int,
    ]
    lib.vd_close.argtypes = [ctypes.c_void_p]
    lib.vd_encode_video.restype = ctypes.c_int
    lib.vd_encode_video.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_char_p,
        ctypes.c_char_p, ctypes.c_int,
    ]
    lib.pk_patchify_normalize.restype = ctypes.c_int
    lib.pk_patchify_normalize.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.fr_resize_frames.restype = ctypes.c_int
    lib.fr_resize_frames.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return lib


_ERRLEN = 512


class VideoReader:
    """Random-access video decoder over a file path or mp4 bytes."""

    def __init__(self, source: str | bytes):
        lib = _load_lib()
        err = ctypes.create_string_buffer(_ERRLEN)
        if isinstance(source, (bytes, bytearray, memoryview)):
            buf = bytes(source)
            self._ctx = lib.vd_open_bytes(buf, len(buf), err, _ERRLEN)
        else:
            self._ctx = lib.vd_open_file(
                os.fspath(source).encode(), err, _ERRLEN
            )
        if not self._ctx:
            raise IOError(f"video open failed: {err.value.decode()}")
        self._lib = lib
        self.width = lib.vd_width(self._ctx)
        self.height = lib.vd_height(self._ctx)
        self.fps = lib.vd_fps(self._ctx)
        self._len = lib.vd_num_frames(self._ctx)

    def __len__(self) -> int:
        return int(self._len)

    def get_avg_fps(self) -> float:
        return float(self.fps)

    def get_batch(self, indices: Sequence[int]) -> np.ndarray:
        """Decode frames -> uint8 [n, H, W, 3]."""
        idx = np.asarray(indices, dtype=np.int64)
        out = np.empty((len(idx), self.height, self.width, 3), np.uint8)
        err = ctypes.create_string_buffer(_ERRLEN)
        ret = self._lib.vd_get_batch(
            self._ctx,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            err, _ERRLEN,
        )
        if ret != 0:
            raise IOError(f"decode failed: {err.value.decode()}")
        return out

    def close(self):
        if self._ctx:
            self._lib.vd_close(self._ctx)
            self._ctx = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def encode_video(path: str, frames_thwc_uint8: np.ndarray, fps: float = 8.0,
                 codec: str = "mpeg4") -> None:
    """Encode an RGB uint8 [T, H, W, 3] clip (tooling/tests;
    convert_to_wds uses this in place of the reference's ffmpeg CLI)."""
    lib = _load_lib()
    frames = np.ascontiguousarray(frames_thwc_uint8, np.uint8)
    t, h, w, c = frames.shape
    assert c == 3
    err = ctypes.create_string_buffer(_ERRLEN)
    ret = lib.vd_encode_video(
        os.fspath(path).encode(),
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        t, h, w, float(fps), codec.encode(), err, _ERRLEN,
    )
    if ret != 0:
        raise IOError(f"encode failed: {err.value.decode()}")


def patchify_normalize(frames_thwc_uint8: np.ndarray,
                       patch_size: Sequence[int]) -> np.ndarray:
    """Fused uint8 THWC -> [-1,1] float32 packed patch rows (C++ kernel).

    Equivalent to ``patchify((frames/255*2-1).transpose(CTHW), patch)``.
    """
    lib = _load_lib()
    frames = np.ascontiguousarray(frames_thwc_uint8, np.uint8)
    T, H, W, C = frames.shape
    p0, p1, p2 = patch_size
    grid = (T // p0) * (H // p1) * (W // p2)
    out = np.empty((grid, p0 * p1 * p2 * C), np.float32)
    lib.pk_patchify_normalize(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        T, H, W, C, p0, p1, p2,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def resize_frames(frames_thwc_uint8: np.ndarray, out_hw: Sequence[int],
                  crop: Sequence[int] | None = None) -> np.ndarray:
    """Fused crop + bicubic resize of a uint8 THWC frame stack via
    libswscale (native/frame_resize.cpp) — the hot augmentation stage of
    the chunk sampler (reference ``dataset/video_dataset.py:95-107``).

    ``crop``: optional (y, x, h, w) window applied before the resize with
    zero copies (pointer offset into the source stack).
    """
    lib = _load_lib()
    frames = np.ascontiguousarray(frames_thwc_uint8, np.uint8)
    T, H, W, C = frames.shape
    assert C == 3, "RGB24 only"
    cy, cx, ch, cw = crop if crop is not None else (0, 0, H, W)
    oh, ow = int(out_hw[0]), int(out_hw[1])
    out = np.empty((T, oh, ow, 3), np.uint8)
    ret = lib.fr_resize_frames(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        T, H, W, int(cy), int(cx), int(ch), int(cw),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), oh, ow,
    )
    if ret != 0:
        raise ValueError(f"fr_resize_frames failed (code {ret}) for "
                         f"crop=({cy},{cx},{ch},{cw}) of {H}x{W} -> {oh}x{ow}")
    return out
