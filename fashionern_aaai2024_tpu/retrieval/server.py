"""`fashionern serve` — a persistent composed-image-retrieval service.

The reference has no serving story (its eval scripts re-embed the
gallery per run, `run/test/test_fiq.py:125-201`); production use of this
model family is exactly a service: embed + refine the gallery ONCE at
startup, keep it chip-resident, then answer composed queries
(reference image + modifier text → top-k gallery items) at the measured
~11.7k queries/sec/chip.

Stdlib-only HTTP (ThreadingHTTPServer):
  POST /query   {"ref_name": str, "caption": str, "k": int=10}
                → {"results": [{"name", "score"}...], "latency_ms"}
  POST /query   also accepts {"captions": [...], "ref_names": [...]} for
                client-side batches.
  GET  /healthz → {"status": "ok", "gallery_size": N}
  GET  /stats   → request count + latency percentiles

Each request runs as ONE jitted dispatch (r3 fused serve program, see
`InferenceAPI.build_serve_fn`). Concurrent single queries additionally
coalesce through a DYNAMIC MICRO-BATCHER: handler threads enqueue, one
device thread drains up to the largest compile bucket per dispatch —
under load, N concurrent b=1 clients cost ~one dispatch instead of N
serialized ones (the per-dispatch round trip dominates at b=1).
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Sequence

import numpy as np

from fashionern_aaai2024_tpu.retrieval import evaluate as E
from fashionern_aaai2024_tpu.retrieval.engine import RetrievalIndex, embed_gallery


class _ServiceBase:
    """Shared request bookkeeping + response formatting for the live
    and artifact-backed services (one copy of the latency buffer,
    percentile stats, and per-row result building)."""

    def _init_stats(self):
        self.batcher = None  # attached by serve(dynamic_batching=True)
        self._lock = threading.Lock()
        self.request_count = 0
        self._latencies: list[float] = []

    def _record_latency(self, latency: float) -> None:
        with self._lock:
            self.request_count += 1
            self._latencies.append(latency)
            if len(self._latencies) > 10_000:
                del self._latencies[:5_000]

    @staticmethod
    def _format_results(names, scores, idx, n: int):
        return [
            [{"name": str(names[idx[q, j]]), "score": float(scores[q, j])}
             for j in range(idx.shape[1])]
            for q in range(n)
        ]

    def stats(self) -> dict:
        with self._lock:
            count = self.request_count
            lat = sorted(self._latencies)

        def pct(p):
            return round(lat[min(len(lat) - 1, int(p * len(lat)))] * 1e3, 2) \
                if lat else None

        out = {
            "requests": count,
            "gallery_size": self.gallery_size,
            "startup_seconds": round(self.startup_seconds, 2),
            "latency_ms": {"p50": pct(0.50), "p90": pct(0.90),
                           "p99": pct(0.99)},
        }
        if self.batcher is not None:
            out["dynamic_batching"] = {
                "batches": self.batcher.batches_run,
                "items": self.batcher.items_run,
                "max_batch": self.batcher.max_batch,
            }
        return out


class RetrievalService(_ServiceBase):
    """Gallery-resident composed retrieval around an InferenceAPI.

    `capacity` (> gallery size): LIVE-GROWABLE gallery — `add_items`
    embeds and serves new items on the running service with zero
    recompiles (the one-dispatch program is capacity-padded and takes
    the valid-row count dynamically). The reference has no serving
    story at all; its eval scripts re-embed everything per run."""

    def __init__(self, api: E.InferenceAPI, classic_loader,
                 caption_join=None, warmup: bool = True,
                 capacity: int | None = None,
                 image_spec: dict | None = None,
                 add_root: str | None = None):
        self.api = api
        # preprocessing recipe for /add items arriving as file paths
        # (dim/pad_mode/target_ratio/image_dtype, same knobs the
        # dataset used at startup); add_root confines which paths the
        # HTTP endpoint may read — clients must not be able to point
        # the daemon at arbitrary host files
        self.image_spec = image_spec or {}
        self.add_root = add_root
        t0 = time.time()
        gallery = embed_gallery(api.gallery_encode_fn(), classic_loader,
                                api.batch_size)
        refined = api.refine_gallery(gallery.features, gallery.local_features)
        self.gallery = gallery
        self._initial_refined = np.asarray(refined, np.float32)
        self.index = RetrievalIndex(gallery.names, refined,
                                    quantize=api.quantize_gallery,
                                    approx_recall=api.approx_recall)
        # fail-safe on the approx tier: measure recall on THIS gallery's
        # real distribution at startup; warn/refuse before taking traffic
        self.measured_topk_recall = self.index.calibrate_approx(strict=True)
        self.rows = E.last_wins_rows(gallery.names)
        self.capacity = capacity
        # one-dispatch serving program with small-batch compile buckets
        # (r3 latency pass: text encode → query → gallery matmul → top-k
        # in a single jitted call; b=1 requests do 1-row work). The
        # gallery's raw features/patches live on-device so a request
        # uploads only token ids + row indices.
        self._serve_fn = api.build_serve_fn(
            refined, patch_num=gallery.local_features.shape[1],
            ref_features=gallery.features,
            ref_patches=gallery.local_features,
            capacity=capacity)
        if warmup:
            self._serve_fn.warmup()
        self.startup_seconds = time.time() - t0
        self.caption_join = caption_join or (lambda c: c)
        # native front-ends may tokenize on their own thread only when
        # no Python-side caption transform sits before the tokenizer
        self.caption_join_is_identity = caption_join is None
        self._init_stats()

    def add_items(self, names: Sequence[str], images: np.ndarray,
                  patches: np.ndarray) -> dict:
        """Embed + serve new gallery items live (requires `capacity`).

        images: [m, H, W, 3] preprocessed (float32 normalized or uint8
        raw); patches: [m, patch_num, d] local features. Unknown names
        are appended; a name the gallery already has is REPLACED in its
        existing row (otherwise the retired duplicate row would keep
        appearing in results next to the new one). Either way items
        answer queries immediately — buffer updates only, no recompile.
        """
        if self.capacity is None:
            raise ValueError(
                "service built without --capacity; live adds need "
                "capacity headroom (restart with serve --capacity N)")
        m = len(names)
        if images.shape[0] != m or patches.shape[0] != m:
            raise ValueError("names/images/patches length mismatch")
        t0 = time.time()
        # embed OUTSIDE the lock (queries keep flowing), chunked to the
        # API's padded batch size
        bs = self.api.batch_size
        feats = np.concatenate([
            self.api.encode_image(images[i : i + bs])[0]
            for i in range(0, m, bs)
        ])
        feats = np.asarray(feats, np.float32)
        patches = np.asarray(patches, np.float32)
        refined = np.asarray(
            self.api.refine_gallery(feats, patches), np.float32)
        with self._lock:
            if not hasattr(self, "_refined"):
                self._refined = self._initial_refined
            replace = [j for j, n in enumerate(names) if n in self.rows]
            append = [j for j, n in enumerate(names) if n not in self.rows]
            for j in replace:
                row = self.rows[names[j]]
                self._serve_fn.update_rows(
                    row, refined[j : j + 1], feats[j : j + 1],
                    patches[j : j + 1])
                self.gallery.features[row] = feats[j]
                self.gallery.local_features[row] = patches[j]
                self._refined[row] = refined[j]
            if append:
                start = len(self.gallery.names)
                self._serve_fn.update_rows(
                    start, refined[append], feats[append], patches[append])
                # host-side copies back the large-k fallback + ref lookups
                self.gallery.names.extend(names[j] for j in append)
                self.gallery.features = np.concatenate(
                    [self.gallery.features, feats[append]])
                self.gallery.local_features = np.concatenate(
                    [self.gallery.local_features, patches[append]])
                self._refined = np.concatenate(
                    [self._refined, refined[append]])
                for i, j in enumerate(append):
                    self.rows[names[j]] = start + i
            # the large-k (> k_max) fallback index rebuilds LAZILY on
            # its next use — the common fused-path queries never pay a
            # full-gallery re-upload per add
            self.index = None
            n_valid = self._serve_fn.n_valid()
        # notify a native front-end (if attached) that the name table
        # changed — it keeps its own lock-free name→row map
        cb = getattr(self, "names_changed_cb", None)
        if cb is not None:
            cb()
        return {"added": len(append), "replaced": len(replace),
                "gallery_size": n_valid,
                "seconds": round(time.time() - t0, 3)}

    def _fallback_index(self) -> RetrievalIndex:
        """Large-k fallback index; rebuilt lazily after live adds
        (must be called with self._lock held)."""
        if self.index is None:
            self.index = RetrievalIndex(
                self.gallery.names,
                getattr(self, "_refined", self._initial_refined),
                quantize=self.api.quantize_gallery,
                approx_recall=self.api.approx_recall)
        return self.index

    def add_from_paths(self, items: Sequence[dict]) -> dict:
        """`POST /add` body: items = [{"name", "image_path",
        "patch_path"}] — decode+preprocess each image with the
        service's startup recipe (native JPEG pipeline where it
        applies), load the [patch_num, d] patch features, then
        `add_items`."""
        if not self.image_spec.get("dim"):
            raise ValueError(
                "service has no image_spec; construct RetrievalService "
                "with image_spec=dict(dim=..., pad_mode=..., ...) to "
                "accept path-based adds")
        if self.add_root is None:
            raise ValueError(
                "path-based adds are disabled: construct RetrievalService "
                "with add_root=<directory> (the serve CLI passes "
                "--data-root) to allow reads under it")
        import os

        from fashionern_aaai2024_tpu.data.transforms import load_and_preprocess

        root = os.path.realpath(self.add_root)

        def confined(p: str) -> str:
            rp = os.path.realpath(str(p))
            if os.path.commonpath([rp, root]) != root:
                raise ValueError("path outside the service add_root")
            return rp

        spec = self.image_spec
        names, imgs, patches = [], [], []
        for it in items:
            names.append(str(it["name"]))
            imgs.append(load_and_preprocess(
                confined(it["image_path"]), spec["dim"],
                spec.get("pad_mode", "target"),
                spec.get("target_ratio", 1.25),
                as_uint8=spec.get("image_dtype") == "uint8"))
            p = np.load(confined(it["patch_path"])).astype(np.float32)
            patches.append(p)
        return self.add_items(names, np.stack(imgs), np.stack(patches))

    @property
    def gallery_size(self) -> int:
        return len(self.gallery.names)

    def query(self, ref_names: Sequence[str], captions: Sequence[str],
              k: int = 10):
        """Composed queries → per-query top-k [(name, score)...]."""
        if len(ref_names) != len(captions):
            raise ValueError("ref_names and captions length mismatch")
        unknown = [r for r in ref_names if r not in self.rows]
        if unknown:
            raise KeyError(f"unknown reference image(s): {unknown[:5]}")
        t0 = time.time()
        caps = [self.caption_join(c) for c in captions]
        rows = np.asarray([self.rows[r] for r in ref_names])
        k_eff = min(k, self.gallery_size)
        with self._lock:
            ids = self.api.tokenize(caps)
            if k_eff <= self._serve_fn.k_max:
                # fast path: ONE device dispatch for the whole query;
                # the ref-row gather runs on-device
                scores, idx = self._serve_fn(ids, rows, k=k_eff)
            else:  # large-k fallback: the multi-dispatch eval path
                ref_feats = self.gallery.features[rows]
                ref_patch = self.gallery.local_features[rows]
                tg, tseq = self.api.encode_text(ids)
                preds = self.api.query(ref_feats, ref_patch, tg, tseq)
                scores, idx = self._fallback_index().search(preds, k=k_eff)
        latency = time.time() - t0
        self._record_latency(latency)
        names = np.asarray(self.gallery.names, dtype=object)
        return self._format_results(names, scores, idx, len(ref_names)), \
            latency


class ArtifactService(_ServiceBase):
    """RetrievalService facade over a loaded AOT artifact (no model code).

    Same HTTP surface (`query`/`stats`/`gallery_size`/`rows`) as the
    live service, but the host needs only jax + the artifact directory +
    the pure-Python BPE tokenizer: startup is deserialize + device_put
    (seconds) instead of gallery embedding (minutes), and there is no
    checkpoint, dataset, or flax import anywhere on the path. The
    reference's only deploy story is shipping the whole training repo
    and re-tracing per run (`/root/reference/run/test/test_fiq.py`).

    `k` clamps to the exported `k_max` — the artifact carries the fused
    top-k program only, not the raw gallery matrix the live service
    falls back to for large k.
    """

    def __init__(self, artifact_dir: str, caption_join=None,
                 warmup: bool = True, allow_platform_mismatch: bool = False):
        from fashionern_aaai2024_tpu.models.clip.tokenizer import tokenize
        from fashionern_aaai2024_tpu.retrieval.artifact import load_serve_artifact

        t0 = time.time()
        self.artifact = load_serve_artifact(
            artifact_dir, allow_platform_mismatch=allow_platform_mismatch)
        if self.artifact.names is None:
            raise ValueError(
                "artifact has no names.json (exported without "
                "gallery_names); the HTTP service needs the row→name map")
        self._tokenize = tokenize
        self._ctx = int(self.artifact.manifest["context_length"])
        # last-wins on duplicate names: matches evaluate.last_wins_rows
        self.rows = {n: i for i, n in enumerate(self.artifact.names)}
        self._names = np.asarray(self.artifact.names, dtype=object)
        # serve() reads ._serve_fn.buckets for the micro-batcher cap
        self._serve_fn = self.artifact
        if warmup:  # execute each bucket once so no query hits a stall
            for b in self.artifact.buckets:
                self.artifact.query(np.zeros((b, self._ctx), np.int32),
                                    np.zeros((b,), np.int32), k=1)
        self.startup_seconds = time.time() - t0
        self.caption_join = caption_join or (lambda c: c)
        self._init_stats()

    @property
    def gallery_size(self) -> int:
        return len(self._names)

    def query(self, ref_names: Sequence[str], captions: Sequence[str],
              k: int = 10):
        if len(ref_names) != len(captions):
            raise ValueError("ref_names and captions length mismatch")
        t0 = time.time()
        caps = [self.caption_join(c) for c in captions]
        # resolve rows, dispatch, and snapshot the row→name map under
        # ONE lock hold: a concurrent /reload swaps rows/names/consts
        # together, and indices computed against one gallery must never
        # be decoded through another's names
        with self._lock:
            unknown = [r for r in ref_names if r not in self.rows]
            if unknown:
                raise KeyError(f"unknown reference image(s): {unknown[:5]}")
            rows = [self.rows[r] for r in ref_names]
            ids = self._tokenize(caps, self._ctx)
            scores, idx = self.artifact.query(ids, rows, k=k)
            names = self._names
        latency = time.time() - t0
        self._record_latency(latency)
        return self._format_results(names, scores, idx, len(ref_names)), \
            latency

    def reload(self) -> dict:
        """POST /reload: re-read the consts sidecar (weights + gallery
        blob republished by `refresh_consts`) into the running daemon —
        no restart, no recompile. Serialized against queries by the
        device lock; returns the swap wall time."""
        t0 = time.time()
        with self._lock:
            self.artifact.reload_consts()
            self.rows = {n: i for i, n in enumerate(self.artifact.names)}
            self._names = np.asarray(self.artifact.names, dtype=object)
        return {"reloaded": True,
                "seconds": round(time.time() - t0, 3),
                "gallery_size": self.gallery_size}

    def stats(self) -> dict:
        out = super().stats()
        out["artifact"] = {"dir": self.artifact.dir,
                           "platform": self.artifact.manifest["platform"],
                           "model_name": self.artifact.manifest.get(
                               "model_name", "")}
        return out


class MicroBatcher:
    """Coalesce concurrent single composed queries into one dispatch.

    Handler threads `submit()` and block; one device thread drains up to
    `max_batch` queued queries (waiting ≤ `max_wait_ms` for stragglers
    after the first arrives) and runs them as ONE fused serve dispatch.
    At b=1 the per-dispatch round trip dominates (BASELINE r3 serve
    ledger: 30 ms floor + ~28 ms work on this host), so N concurrent
    clients cost ~one dispatch instead of N serialized ones."""

    def __init__(self, service: RetrievalService, max_batch: int = 32,
                 max_wait_ms: float = 2.0):
        self.service = service
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self.batches_run = 0
        self.items_run = 0
        self._cv = threading.Condition()
        self._queue: list = []
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, ref_name: str, caption: str, k: int = 10):
        """One composed query → (top-k results, device latency)."""
        if ref_name not in self.service.rows:
            # fail fast without poisoning the batch
            raise KeyError(f"unknown reference image(s): ['{ref_name}']")
        k_cap = getattr(self.service._serve_fn, "k_max", None)
        if k_cap is not None and int(k) > k_cap:
            # a large-k request runs on the multi-dispatch fallback;
            # coalescing it would drag every waiter in the batch off
            # the fused fast path (batch k is max over its items)
            out, latency = self.service.query([ref_name], [caption], k=k)
            return out[0], latency
        slot: dict = {"event": threading.Event()}
        with self._cv:
            if self._stop:
                raise RuntimeError("batcher closed")
            self._queue.append((ref_name, caption, int(k), slot))
            self._cv.notify_all()
        slot["event"].wait()
        if "error" in slot:
            raise slot["error"]
        return slot["results"], slot["latency"]

    def close(self):
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        self._thread.join(timeout=5)

    def _loop(self):
        while True:
            with self._cv:
                while not self._queue and not self._stop:
                    self._cv.wait()
                if self._stop and not self._queue:
                    return
                deadline = time.time() + self.max_wait
                while len(self._queue) < self.max_batch and not self._stop:
                    left = deadline - time.time()
                    if left <= 0:
                        break
                    self._cv.wait(timeout=left)
                items = self._queue[: self.max_batch]
                del self._queue[: self.max_batch]
            refs = [it[0] for it in items]
            caps = [it[1] for it in items]
            k = max(it[2] for it in items)
            try:
                out, latency = self.service.query(refs, caps, k=k)
            except Exception as e:  # propagate to every waiter
                for *_, slot in items:
                    slot["error"] = e
                    slot["event"].set()
                continue
            self.batches_run += 1
            self.items_run += len(items)
            for (_, _, ki, slot), res in zip(items, out):
                slot["results"] = res[:ki]
                slot["latency"] = latency
                slot["event"].set()


def _make_handler(service: RetrievalService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet; stats endpoint covers it
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok",
                                 "gallery_size": service.gallery_size})
            elif self.path == "/stats":
                self._send(200, service.stats())
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path == "/reload":
                # live consts swap (artifact-backed services only):
                # after `refresh_consts` republishes the sidecar, the
                # daemon picks up the retrained weights/gallery with no
                # restart and no recompile
                if not hasattr(service, "reload"):
                    self._send(404, {
                        "error": "reload is only supported by "
                                 "artifact-backed services"})
                    return
                try:
                    self._send(200, service.reload())
                except Exception as e:
                    self._send(409, {"error": f"{type(e).__name__}: {e}"})
                return
            if self.path == "/add":
                # live gallery additions (requires serve --capacity):
                # items = [{"name", "image_path", "patch_path"}];
                # images/patches are read from the serving host's disk
                # (new catalog items land there), embedded, and
                # queryable on the next request — no restart/recompile
                if not hasattr(service, "add_from_paths"):
                    self._send(404, {
                        "error": "live adds need a model-backed service"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    items = list(req["items"])
                except Exception as e:
                    self._send(400, {"error": f"{type(e).__name__}: {e}"})
                    return
                try:
                    self._send(200, service.add_from_paths(items))
                except (ValueError, KeyError, OSError) as e:
                    self._send(409, {"error": f"{type(e).__name__}: {e}"})
                return
            if self.path != "/query":
                self._send(404, {"error": "unknown path"})
                return
            try:  # request shape errors → 400
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
                batch = "ref_names" in req
                if batch:
                    refs = list(req["ref_names"])
                    caps = list(req["captions"])
                else:
                    refs = [req["ref_name"]]
                    caps = [req["caption"]]
                k = int(req.get("k", 10))
            except Exception as e:
                self._send(400, {"error": f"{type(e).__name__}: {e}"})
                return
            try:  # unknown gallery refs → 404
                batcher = getattr(service, "batcher", None)
                if not batch and batcher is not None:
                    res0, latency = batcher.submit(refs[0], caps[0], k=k)
                    results = [res0]
                else:
                    results, latency = service.query(refs, caps, k=k)
            except KeyError as e:
                self._send(404, {"error": str(e)})
                return
            except Exception as e:
                self._send(400, {"error": f"{type(e).__name__}: {e}"})
                return
            self._send(200, {
                "results": results if batch else results[0],
                "latency_ms": round(latency * 1e3, 2),
            })

    return Handler


def serve(service: RetrievalService, host: str = "127.0.0.1",
          port: int = 8080, dynamic_batching: bool = True,
          max_batch: int | None = None) -> ThreadingHTTPServer:
    """Build the HTTP server (caller runs `serve_forever`, or uses the
    returned server's port for tests). `dynamic_batching` coalesces
    concurrent single queries into shared dispatches (MicroBatcher);
    `max_batch` defaults to the serve program's largest compile bucket."""
    if dynamic_batching and getattr(service, "batcher", None) is None:
        mb = max_batch or (max(service._serve_fn.buckets)
                           if hasattr(service._serve_fn, "buckets") else 32)
        service.batcher = MicroBatcher(service, max_batch=mb)
    return ThreadingHTTPServer((host, port), _make_handler(service))
