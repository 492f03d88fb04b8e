"""ctypes binding + device loop for the native serving front-end
(fastserve.cpp).

Division of labor (why: on a small host the Python ThreadingHTTPServer's
handler threads — HTTP parse, json, per-request wakeups — steal the GIL
from the device thread; BASELINE.md r3 measured a ~52 ms b=32 dispatch
costing ~333 ms through the Python front under concurrent load):

  C++ IO thread (GIL-free): accept → HTTP parse → JSON parse → BPE
      tokenize (fasttokenizer) → name→row lookup → micro-batch queue
  Python device thread:     fs_next_batch (blocks with the GIL
      RELEASED) → one jitted serve dispatch → fs_complete_batch
  C++ (inside that call):   per-item top-k JSON formatting → epoll
      writeback

The reference has no serving story at all (its eval scripts re-embed the
gallery per run, /root/reference/run/test/test_fiq.py:125-201).

Usage:
    ns = serve_native(service, host="0.0.0.0", port=8080)
    ... ns.port, ns.wait(), ns.shutdown()

Endpoints served natively: POST /query (single + client-batch),
GET /healthz, GET /stats. Admin endpoints (/add, /reload) answer 501 —
run the Python server on a second (admin) port for those; after a live
add the service's `names_changed_cb` hook pushes the new name table into
the C++ front with one `fs_set_names` swap.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "fastserve.cpp")
_TOK_SRC = os.path.join(os.path.dirname(__file__), "fasttokenizer.cpp")
_LIB = None
_TRIED = False

MAX_CAPTION = 64 * 1024  # must match kMaxCaption in fastserve.cpp


def _cache_path() -> str:
    h = hashlib.sha256()
    for src in (_SRC, _TOK_SRC):  # fastserve #includes fasttokenizer
        with open(src, "rb") as f:
            h.update(f.read())
    digest = h.hexdigest()[:16]
    cache_dir = os.environ.get(
        "FASHIONERN_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "fashionern_native"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"fastserve_{digest}.so")


def _build() -> str | None:
    so = _cache_path()
    if os.path.exists(so):
        return so
    tmp = f"{so}.{os.getpid()}.tmp"  # concurrent-first-use safe
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
           _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
    except (OSError, subprocess.SubprocessError) as e:  # pragma: no cover
        print(f"fashionern.native.serve_frontend: build failed ({e}); "
              "use the Python HTTP server", file=sys.stderr)
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
    i32, i64, vp, cp = (ctypes.c_int32, ctypes.c_int64, ctypes.c_void_p,
                        ctypes.c_char_p)
    lib.fs_create.restype = vp
    lib.fs_create.argtypes = [cp, vp, i32, cp, i64, i32, i32, i32, i64]
    lib.fs_set_names.restype = None
    lib.fs_set_names.argtypes = [vp, cp, vp, i32]
    lib.fs_listen.restype = i32
    lib.fs_listen.argtypes = [vp, cp, i32]
    lib.fs_next_batch.restype = i64
    lib.fs_next_batch.argtypes = [vp, vp, vp, vp, vp, vp, i64, vp, vp]
    lib.fs_complete_batch.restype = None
    lib.fs_complete_batch.argtypes = [vp, i64, vp, vp, i32, i32]
    lib.fs_fail_batch.restype = None
    lib.fs_fail_batch.argtypes = [vp, i64, cp]
    lib.fs_port.restype = i32
    lib.fs_port.argtypes = [vp]
    lib.fs_shutdown.restype = None
    lib.fs_shutdown.argtypes = [vp]
    lib.fs_destroy.restype = None
    lib.fs_destroy.argtypes = [vp]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _pack_names(names) -> tuple[bytes, np.ndarray, int]:
    encoded = [str(n).encode("utf-8") for n in names]
    offsets = np.zeros(len(encoded) + 1, np.int64)
    np.cumsum([len(e) for e in encoded], out=offsets[1:])
    return b"".join(encoded), offsets, len(encoded)


class NativeFrontend:
    """One fastserve Server instance: epoll HTTP front + batch queue.

    `merges`: list[(str, str)] BPE merge table → captions tokenize on
    the C++ IO thread (per-item fallback flag for non-ASCII/entities);
    None → every item is flagged fallback and the device loop tokenizes
    through the service's Python tokenizer (exact-id parity either way,
    same contract as native/tokenizer.py).
    """

    def __init__(self, names, ctx: int, max_batch: int = 32,
                 k_max: int = 50, merges=None, max_wait_ms: float = 2.0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native serve front-end unavailable")
        self._lib = lib
        self.ctx = int(ctx)
        self.max_batch = int(max_batch)
        self.k_max = int(k_max)
        blob = (b"" if merges is None else
                "\n".join(f"{a} {b}" for a, b in merges).encode("utf-8"))
        names_buf, offsets, n = _pack_names(names)
        self._h = lib.fs_create(
            names_buf, offsets.ctypes.data, n, blob if blob else None,
            len(blob), self.ctx, self.max_batch, self.k_max,
            int(max_wait_ms * 1e3))
        # reusable batch transfer buffers (one device thread → no races)
        self._ids = np.zeros((self.max_batch, self.ctx), np.int32)
        self._rows = np.zeros(self.max_batch, np.int32)
        self._ks = np.zeros(self.max_batch, np.int32)
        self._fallback = np.zeros(self.max_batch, np.int8)
        self._capbuf = np.empty(self.max_batch * MAX_CAPTION + 1, np.uint8)
        self._capoff = np.zeros(self.max_batch + 1, np.int64)
        self.port = 0

    def listen(self, host: str = "127.0.0.1", port: int = 0) -> int:
        p = int(self._lib.fs_listen(self._h, host.encode(), int(port)))
        if p <= 0:
            raise OSError(f"fastserve: failed to bind {host}:{port}")
        self.port = p
        return p

    def set_names(self, names) -> None:
        names_buf, offsets, n = _pack_names(names)
        self._lib.fs_set_names(self._h, names_buf, offsets.ctypes.data, n)

    def next_batch(self):
        """Block (GIL released) until a batch is ready. Returns
        (batch_id, ids [n,ctx], rows [n], ks [n], fallback_mask [n],
        captions list[str]) or None on shutdown. Returned arrays are
        views into reusable buffers — consumed before the next call."""
        out_n = ctypes.c_int32(0)
        bid = self._lib.fs_next_batch(
            self._h, self._ids.ctypes.data, self._rows.ctypes.data,
            self._ks.ctypes.data, self._fallback.ctypes.data,
            self._capbuf.ctypes.data, self._capbuf.size,
            self._capoff.ctypes.data, ctypes.byref(out_n))
        if bid == 0:
            return None
        n = out_n.value
        caps = [
            self._capbuf[self._capoff[i]:self._capoff[i + 1]]
            .tobytes().decode("utf-8", errors="replace")
            for i in range(n)
        ]
        return (int(bid), self._ids[:n], self._rows[:n], self._ks[:n],
                self._fallback[:n] != 0, caps)

    def complete(self, batch_id: int, scores: np.ndarray, idx: np.ndarray,
                 k_used: int) -> None:
        scores = np.ascontiguousarray(scores, np.float32)
        idx = np.ascontiguousarray(idx, np.int32)
        self._lib.fs_complete_batch(
            self._h, int(batch_id), scores.ctypes.data, idx.ctypes.data,
            scores.shape[0], int(k_used))

    def fail(self, batch_id: int, message: str) -> None:
        self._lib.fs_fail_batch(self._h, int(batch_id),
                                message.encode("utf-8", errors="replace"))

    def shutdown(self) -> None:
        if self._h:
            self._lib.fs_shutdown(self._h)

    def close(self) -> None:
        if self._h:
            self._lib.fs_destroy(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def _service_merges(service):
    """The BPE merge table for IO-thread tokenization, or None when any
    Python-side step (caption_join, custom tokenizer) must run first."""
    if not getattr(service, "caption_join_is_identity", False):
        return None
    api = getattr(service, "api", None)
    if api is None:
        return None
    from fashionern_aaai2024_tpu.models.clip import tokenizer as T

    if getattr(api, "_tokenizer", None) is not T.tokenize:
        return None  # custom tokenizer → fallback path keeps parity
    try:
        return T._default_tokenizer()._merges
    except Exception:
        return None


class NativeServer:
    """Running native front + its Python device-loop thread."""

    def __init__(self, frontend: NativeFrontend, service, thread):
        self.frontend = frontend
        self.service = service
        self.port = frontend.port
        self._thread = thread

    def wait(self, timeout: float | None = None) -> None:
        self._thread.join(timeout)

    def shutdown(self) -> None:
        self.frontend.shutdown()
        self._thread.join(timeout=10)
        self.frontend.close()


def _device_loop(frontend: NativeFrontend, service) -> None:
    sf = service._serve_fn
    join = service.caption_join
    while True:
        nb = frontend.next_batch()
        if nb is None:
            return
        bid, ids, rows, ks, fb, caps = nb
        try:
            if fb.any():
                # Python tokenizer path: exact-id parity for captions the
                # C core does not cover (and the whole batch when the
                # front was built without a merge table)
                sel = np.nonzero(fb)[0]
                ids[sel] = service.api.tokenize([join(caps[i]) for i in sel])
            k_used = int(min(max(int(ks.max()), 1), sf.k_max))
            scores, idx = sf(ids, rows, k=k_used)
            scores = np.asarray(scores, np.float32)
            idx = np.asarray(idx, np.int32)
            frontend.complete(bid, scores, idx, idx.shape[1])
        except Exception as e:  # noqa: BLE001 — every waiter gets a 500
            frontend.fail(bid, f"{type(e).__name__}: {e}")


def serve_native(service, host: str = "127.0.0.1", port: int = 0,
                 max_wait_ms: float = 2.0) -> NativeServer:
    """Start the native HTTP front over a RetrievalService and its
    device-loop thread; returns immediately (daemon thread)."""
    sf = service._serve_fn
    max_batch = max(sf.buckets) if hasattr(sf, "buckets") else 32
    names = getattr(getattr(service, "gallery", None), "names", None)
    if names is None:
        raise ValueError("service has no gallery name table")
    frontend = NativeFrontend(
        names, ctx=service.api.context_length, max_batch=max_batch,
        k_max=sf.k_max, merges=_service_merges(service),
        max_wait_ms=max_wait_ms)
    frontend.listen(host, port)
    # live adds (admin server) push the grown name table into the front
    service.names_changed_cb = (
        lambda: frontend.set_names(service.gallery.names))
    t = threading.Thread(target=_device_loop, args=(frontend, service),
                         daemon=True, name="fastserve-device")
    t.start()
    return NativeServer(frontend, service, t)
