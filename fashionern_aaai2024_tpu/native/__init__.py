"""Native (C++) data-loader core with transparent numpy fallback.

`fastloader.cpp` is compiled on first use with g++ into a per-version
cached shared library and bound via ctypes (no pybind11 dependency).
If no toolchain is available, every entry point silently falls back to
the numpy implementation — results are identical, only slower.

Public API:
  * gather_rows(pack, indices)          — [K, ...] rows from a 2-D+ pack
  * normalize_images(u8_nhwc)           — fused CLIP uint8→f32 normalize
  * available()                         — True when the native lib loaded
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile

import numpy as np

from fashionern_aaai2024_tpu.data.transforms import CLIP_MEAN, CLIP_STD

_SRC = os.path.join(os.path.dirname(__file__), "fastloader.cpp")
_LIB = None
_TRIED = False


def _cache_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "FASHIONERN_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "fashionern_native"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"fastloader_{digest}.so")


def _build() -> str | None:
    so = _cache_path()
    if os.path.exists(so):
        return so
    # per-process tmp name: concurrent first-use builds must not
    # interleave writes into one file and publish a corrupt .so
    tmp = f"{so}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
        _SRC, "-o", tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError) as e:  # pragma: no cover
        print(f"fashionern.native: build failed ({e}); using numpy fallback",
              file=sys.stderr)
        return None
    os.replace(tmp, so)
    return so


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("FASHIONERN_NO_NATIVE", "0") == "1":
        return None
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.gather_rows_f32.restype = ctypes.c_int
    lib.gather_rows_f32.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
    ]
    lib.normalize_u8_to_f32.restype = None
    lib.normalize_u8_to_f32.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def gather_rows(pack: np.ndarray, indices) -> np.ndarray:
    """pack[[i for i in indices]] as one contiguous float32 batch.
    pack: [N, ...] float32 (C-contiguous, e.g. the patch pack mmap)."""
    idx = np.ascontiguousarray(np.asarray(indices, np.int64))
    lib = _load()
    if lib is None or pack.dtype != np.float32 or not pack.flags["C_CONTIGUOUS"]:
        return np.ascontiguousarray(pack[idx])
    row_elems = int(np.prod(pack.shape[1:], dtype=np.int64))
    out = np.empty((idx.shape[0],) + pack.shape[1:], np.float32)
    rc = lib.gather_rows_f32(
        pack.ctypes.data, pack.shape[0], row_elems,
        idx.ctypes.data, idx.shape[0], out.ctypes.data,
    )
    if rc != 0:
        raise IndexError(
            f"gather_rows: index out of range for pack with {pack.shape[0]} rows"
        )
    return out


_MEAN32 = np.asarray(CLIP_MEAN, np.float32)
_STD32 = np.asarray(CLIP_STD, np.float32)


def normalize_images(u8_nhwc: np.ndarray) -> np.ndarray:
    """CLIP normalization of uint8 NHWC images (any leading shape with
    a trailing channel axis of 3): (x/255 - mean)/std → float32."""
    arr = np.ascontiguousarray(u8_nhwc)
    if arr.shape[-1] != 3:
        raise ValueError(f"expected trailing channel axis of 3, got {arr.shape}")
    lib = _load()
    if lib is None or arr.dtype != np.uint8:
        return ((arr.astype(np.float32) / 255.0) - _MEAN32) / _STD32
    out = np.empty(arr.shape, np.float32)
    n_pixels = arr.size // 3
    lib.normalize_u8_to_f32(
        arr.ctypes.data, n_pixels, _MEAN32.ctypes.data, _STD32.ctypes.data,
        out.ctypes.data,
    )
    return out
