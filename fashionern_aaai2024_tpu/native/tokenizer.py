"""ctypes binding for the native CLIP BPE tokenizer (fasttokenizer.cpp).

The C core replicates `models.clip.tokenizer.SimpleTokenizer.encode`
for printable-ASCII texts (all four benchmarks' captions) and returns a
per-text fallback flag for anything it does not cover (HTML entities,
non-ASCII bytes, special-token literals) — those rows are re-encoded by
the Python tokenizer, so results are ALWAYS identical to the pure-Python
path (parity pinned by tests/test_native.py::TestNativeTokenizer).

Why native: the encode call releases the GIL (ctypes), so a
multi-threaded serving host tokenizes concurrently instead of
serializing on the interpreter — the serve micro-batcher's host-side
cost (BASELINE.md concurrent-load position) — and single-thread encode
is ~an order of magnitude faster than the Python BPE loop.

Build: g++ on first use, cached per source hash; no toolchain → every
caller transparently stays on the Python path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "fasttokenizer.cpp")
_LIB = None
_TRIED = False

FT_OK = 0
FT_FALLBACK = 1


def _cache_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "FASHIONERN_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "fashionern_native"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"fasttokenizer_{digest}.so")


def _build() -> str | None:
    so = _cache_path()
    if os.path.exists(so):
        return so
    tmp = f"{so}.{os.getpid()}.tmp"  # concurrent-first-use safe
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
           _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError) as e:  # pragma: no cover
        print(f"fashionern.native.tokenizer: build failed ({e}); "
              "using the Python tokenizer", file=sys.stderr)
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
    lib.ft_create.restype = ctypes.c_void_p
    lib.ft_create.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.ft_destroy.argtypes = [ctypes.c_void_p]
    lib.ft_sot.restype = ctypes.c_int32
    lib.ft_sot.argtypes = [ctypes.c_void_p]
    lib.ft_eot.restype = ctypes.c_int32
    lib.ft_eot.argtypes = [ctypes.c_void_p]
    lib.ft_encode_batch.restype = None
    lib.ft_encode_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


class NativeBPE:
    """Handle over the C tokenizer for one merges table.

    `encode_batch(texts, context_length)` returns (ids [B, L] int32,
    fallback_mask [B] bool) — rows flagged True must be re-encoded by
    the Python tokenizer (non-ASCII / entities / special tokens)."""

    def __init__(self, merges):
        lib = _load()
        if lib is None:
            raise RuntimeError("native tokenizer unavailable")
        blob = "\n".join(f"{a} {b}" for a, b in merges).encode("utf-8")
        self._lib = lib
        self._blob = blob  # keep alive (ft_create copies, but be safe)
        self._h = lib.ft_create(blob, len(blob))

    def __del__(self):  # pragma: no cover
        h, lib = getattr(self, "_h", None), getattr(self, "_lib", None)
        if h and lib is not None:
            lib.ft_destroy(h)

    @property
    def sot_token(self) -> int:
        return int(self._lib.ft_sot(self._h))

    @property
    def eot_token(self) -> int:
        return int(self._lib.ft_eot(self._h))

    def encode_batch(self, texts, context_length: int):
        encoded = [t.encode("utf-8") for t in texts]
        buf = b"".join(encoded)
        offsets = np.zeros(len(texts) + 1, np.int64)
        np.cumsum([len(e) for e in encoded], out=offsets[1:])
        out = np.zeros((len(texts), context_length), np.int32)
        rc = np.zeros(len(texts), np.int8)
        self._lib.ft_encode_batch(
            self._h, buf, offsets.ctypes.data, len(texts),
            out.ctypes.data, context_length, rc.ctypes.data,
        )
        return out, rc != FT_OK
