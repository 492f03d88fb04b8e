"""ctypes binding for the native image pipeline (fastimage.cpp).

Compiled on first use with g++ against the system libjpeg
(libjpeg-turbo); if the toolchain or library is missing, ``available()``
returns False and callers use the PIL path — results are identical
(the native resampler is a bit-exact reimplementation of Pillow's
fixed-point bicubic; parity pinned by tests/test_native_image.py).

Public API:
  * available()                          — True when the native lib loaded
  * decode_jpeg(data)                    — JPEG bytes → u8 [H, W, 3] (or None)
  * resize_bicubic(u8_hwc, out_w, out_h) — Pillow-exact bicubic resize
  * decode_preprocess(data, dim, ...)    — full pipeline → f32/u8 [dim,dim,3]
                                           (None → caller falls back to PIL)
  * decode_preprocess_batch(items, ...)  — threaded batch; returns
                                           (batch, statuses)
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

_SRC = os.path.join(os.path.dirname(__file__), "fastimage.cpp")
_LIB = None
_TRIED = False

PAD_MODES = {"none": 0, "target": 1, "square": 2}

# Status codes from fastimage.cpp
OK = 0
DECODE_ERROR = 1
UNSUPPORTED_COLOR = 2
GEOMETRY = 3


# -march=native is safe: the .so is built on (and cached per) the host
# that runs it. Falls back to a portable build if that flag fails.
# -ffp-contract=off keeps the float math FMA-free so the normalize and
# coefficient arithmetic round identically to the (contract-free) PIL
# path — bit-parity is the contract here.
_FLAGS = ["-O3", "-march=native", "-ffp-contract=off",
          "-shared", "-fPIC", "-pthread", "-std=c++17"]
_FLAGS_PORTABLE = ["-O3", "-ffp-contract=off",
                   "-shared", "-fPIC", "-pthread", "-std=c++17"]


def _cache_path(flags) -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read() + " ".join(flags).encode()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "FASHIONERN_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "fashionern_native"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"fastimage_{digest}.so")


def _build() -> str | None:
    err = None
    for flags in (_FLAGS, _FLAGS_PORTABLE):
        so = _cache_path(flags)
        if os.path.exists(so):
            return so
        # per-process tmp name: concurrent first-use builds (fork
        # workers, parallel test runs) must not interleave writes into
        # one file and publish a corrupt .so
        tmp = f"{so}.{os.getpid()}.tmp"
        cmd = ["g++", *flags, _SRC, "-o", tmp, "-ljpeg"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError) as e:  # pragma: no cover
            err = e
            continue
        os.replace(tmp, so)
        return so
    print(f"fashionern.native.image: build failed ({err}); using PIL fallback",
          file=sys.stderr)  # pragma: no cover
    return None


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
    try:
        lib = ctypes.CDLL(so)
    except OSError as e:  # pragma: no cover - missing libjpeg at runtime
        print(f"fashionern.native.image: load failed ({e}); using PIL fallback",
              file=sys.stderr)
        return None
    lib.fe_jpeg_dims.restype = ctypes.c_int
    lib.fe_jpeg_dims.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.fe_decode_jpeg.restype = ctypes.c_int
    lib.fe_decode_jpeg.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.fe_resize_bicubic_u8.restype = ctypes.c_int
    lib.fe_resize_bicubic_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
    ]
    lib.fe_decode_preprocess.restype = ctypes.c_int
    lib.fe_decode_preprocess.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p,
    ]
    lib.fe_extract_crops.restype = ctypes.c_int
    lib.fe_extract_crops.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.fe_decode_preprocess_batch.restype = None
    lib.fe_decode_preprocess_batch.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


_MEAN32 = np.asarray(CLIP_MEAN, np.float32)
_STD32 = np.asarray(CLIP_STD, np.float32)


def is_jpeg(data: bytes) -> bool:
    return len(data) > 3 and data[:2] == b"\xff\xd8"


def decode_jpeg(data: bytes) -> np.ndarray | None:
    """JPEG bytes → u8 [H, W, 3], or None when undecodable/unsupported."""
    lib = _load()
    if lib is None or not is_jpeg(data):
        return None
    buf = np.frombuffer(data, np.uint8)
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    rc = lib.fe_jpeg_dims(buf.ctypes.data, buf.size,
                          ctypes.byref(w), ctypes.byref(h))
    if rc != OK:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.fe_decode_jpeg(buf.ctypes.data, buf.size, out.ctypes.data,
                            out.size, ctypes.byref(w), ctypes.byref(h))
    return out if rc == OK else None


def resize_bicubic(src: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Pillow-exact bicubic resize of u8 [H, W] or [H, W, C]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native image library unavailable")
    arr = np.ascontiguousarray(src, np.uint8)
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[:, :, None]
    out = np.empty((out_h, out_w, arr.shape[2]), np.uint8)
    rc = lib.fe_resize_bicubic_u8(arr.ctypes.data, arr.shape[0], arr.shape[1],
                                  arr.shape[2], out_w, out_h, out.ctypes.data)
    if rc != OK:
        raise ValueError(f"resize failed with status {rc}")
    return out[:, :, 0] if squeeze else out


def decode_preprocess(
    data: bytes,
    dim: int,
    pad_mode: str = "target",
    target_ratio: float = 1.25,
    normalize: bool = True,
) -> np.ndarray | None:
    """Full pipeline for one JPEG; None → caller must use the PIL path."""
    lib = _load()
    if lib is None or not is_jpeg(data):
        return None
    buf = np.frombuffer(data, np.uint8)
    out = np.empty((dim, dim, 3), np.float32 if normalize else np.uint8)
    rc = lib.fe_decode_preprocess(
        buf.ctypes.data, buf.size, dim, PAD_MODES[pad_mode], target_ratio,
        _MEAN32.ctypes.data, _STD32.ctypes.data, int(normalize),
        out.ctypes.data,
    )
    return out if rc == OK else None


def extract_crops(data: bytes, dim: int, resize: int = 360) -> np.ndarray | None:
    """One JPEG → [13, dim, dim, 3] CLIP-normalized crops (the offline
    patch-extraction geometry: resize² board, 2×2 + 3×3 grid, per-crop
    bicubic to dim² — bit-identical to the PIL path for square crops
    under the default TargetPad ratio). None → caller falls back."""
    lib = _load()
    if lib is None or not is_jpeg(data):
        return None
    buf = np.frombuffer(data, np.uint8)
    out = np.empty((13, dim, dim, 3), np.float32)
    rc = lib.fe_extract_crops(buf.ctypes.data, buf.size, resize, dim,
                              _MEAN32.ctypes.data, _STD32.ctypes.data,
                              out.ctypes.data)
    return out if rc == OK else None


def decode_preprocess_batch(
    items: list[bytes],
    dim: int,
    pad_mode: str = "target",
    target_ratio: float = 1.25,
    normalize: bool = True,
) -> tuple[np.ndarray, np.ndarray] | None:
    """Threaded batch pipeline. Returns (batch [N, dim, dim, 3],
    statuses [N] int64 — 0 = ok, nonzero slots are zero-filled and need
    the caller's PIL fallback). None when the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(items)
    # empty, not zeros: failed slots are zero-filled by the C side
    batch = np.empty((n, dim, dim, 3), np.float32 if normalize else np.uint8)
    statuses = np.full((n,), DECODE_ERROR, np.int64)
    if n == 0:
        return batch, statuses
    bufs = [np.frombuffer(b, np.uint8) if is_jpeg(b) else None for b in items]
    ptrs = (ctypes.c_void_p * n)()
    lens = np.zeros((n,), np.int64)
    # Non-JPEG items get a 0-length buffer → decode error → PIL fallback.
    zero = np.zeros((1,), np.uint8)
    for i, b in enumerate(bufs):
        ptrs[i] = (b if b is not None else zero).ctypes.data
        lens[i] = 0 if b is None else b.size
    lib.fe_decode_preprocess_batch(
        ptrs, lens.ctypes.data, n, dim, PAD_MODES[pad_mode], target_ratio,
        _MEAN32.ctypes.data, _STD32.ctypes.data, int(normalize),
        batch.ctypes.data, statuses.ctypes.data,
    )
    return batch, statuses
