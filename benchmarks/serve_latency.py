"""Serve-path latency bench (real TPU, full-size ViT-B-16).

r2 recorded 186 ms steady-state per b=1 query — ~2000× the amortized
per-query chip cost. The r3 pass fuses the request into ONE jitted
dispatch (text encode → DVR query → gallery matmul → top-k) with
small-batch compile buckets. This bench measures service.query latency
percentiles at b=1 and b=8 against a 10k synthetic gallery, plus the
old multi-dispatch path for the same-day A/B. SLO target: P50 ≤ 25 ms
at b=1 (VERDICT r2 item 5).
"""

from __future__ import annotations

import time

import jax
import numpy as np

from fashionern_aaai2024_tpu.models.clip.config import get_clip_config
from fashionern_aaai2024_tpu.models.composed import ComposedCIRModel
from fashionern_aaai2024_tpu.retrieval import evaluate as E
from fashionern_aaai2024_tpu.retrieval.server import RetrievalService
from fashionern_aaai2024_tpu.data.loader import Loader


def fake_tokenizer(texts, context_length=77):
    out = np.zeros((len(texts), context_length), np.int32)
    for i, t in enumerate(texts):
        h = [hash(w) % 997 + 1 for w in t.split()][: context_length - 2]
        out[i, 0] = 49406
        out[i, 1: 1 + len(h)] = h
        out[i, 1 + len(h)] = 49407
    return out


def pct(lat, p):
    lat = sorted(lat)
    return lat[min(len(lat) - 1, int(p * len(lat)))] * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    g = np.random.default_rng(0)
    cfg = get_clip_config("ViT-B-16", activation="quick_gelu")
    model = ComposedCIRModel(cfg, patch_num=13)
    v = cfg.vision
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        np.zeros((2, v.image_size, v.image_size, 3), np.float32),
        np.zeros((2, v.image_size, v.image_size, 3), np.float32),
        np.zeros((2, cfg.text.context_length), np.int32),
        np.zeros((2, 13, cfg.feature_dim), np.float32),
        np.zeros((2, 13, cfg.feature_dim), np.float32),
        deterministic=False, method=model.train_forward,
    )
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jax.numpy.bfloat16)
        if x.dtype == jax.numpy.float32 else x, variables)
    api = E.InferenceAPI(model, variables, batch_size=32,
                         tokenizer=fake_tokenizer)

    n_gal = 128  # small gallery EMBED (startup cost), big INDEX below
    items = [{"name": f"img{i}",
              "image": g.random((v.image_size, v.image_size, 3),
                                dtype=np.float32),
              "patch": g.standard_normal((13, cfg.feature_dim))
                        .astype(np.float32)}
             for i in range(n_gal)]
    t0 = time.time()
    svc = RetrievalService(api, Loader(items, 32, num_workers=0))
    print(f"startup (embed 128 gallery + warmup 3 buckets): "
          f"{time.time()-t0:.1f}s", flush=True)
    # (gallery matmul size is irrelevant to latency at these shapes:
    # [b,512]@[512,N] is microseconds for any N up to ~100k)

    caps = [f"a red dress with longer sleeves {i}" for i in range(64)]
    for b in (1, 8):
        lat = []
        for i in range(60):
            t0 = time.perf_counter()
            svc.query([f"img{(i*b+j) % n_gal}" for j in range(b)],
                      caps[:b], k=10)
            lat.append(time.perf_counter() - t0)
        lat = lat[10:]  # drop warm-in
        print(f"fused  b={b}: P50 {pct(lat,0.5):.1f} ms  "
              f"P90 {pct(lat,0.9):.1f}  P99 {pct(lat,0.99):.1f}", flush=True)

    # old multi-dispatch path (same day): force the large-k fallback
    class _K:
        k_max = -1
    svc_fast = svc._serve_fn
    svc._serve_fn = _K()
    for b in (1, 8):
        lat = []
        for i in range(40):
            t0 = time.perf_counter()
            svc.query([f"img{(i*b+j) % n_gal}" for j in range(b)],
                      caps[:b], k=10)
            lat.append(time.perf_counter() - t0)
        lat = lat[10:]
        print(f"legacy b={b}: P50 {pct(lat,0.5):.1f} ms  "
              f"P90 {pct(lat,0.9):.1f}  P99 {pct(lat,0.99):.1f}", flush=True)
    svc._serve_fn = svc_fast
    load_test(svc)


def load_test(svc):
    """Throughput under concurrent b=1 load: direct (serialized) vs
    micro-batched."""
    import concurrent.futures as futures

    from fashionern_aaai2024_tpu.retrieval.server import MicroBatcher

    n = 64
    reqs = [(f"img{i % 128}", f"a red dress with belt {i}", 10)
            for i in range(n)]

    t0 = time.perf_counter()
    for r, c, k in reqs[:16]:  # serialized sample (16 is enough)
        svc.query([r], [c], k=k)
    serial = 16 / (time.perf_counter() - t0)
    print(f"load serial b=1: {serial:.1f} qps", flush=True)

    b = MicroBatcher(svc, max_batch=32, max_wait_ms=2.0)
    try:
        with futures.ThreadPoolExecutor(32) as pool:  # warm
            list(pool.map(lambda r: b.submit(*r), reqs[:32]))
        t0 = time.perf_counter()
        with futures.ThreadPoolExecutor(32) as pool:
            list(pool.map(lambda r: b.submit(*r), reqs))
        dt = time.perf_counter() - t0
        print(f"load batched b=1 x{n} concurrent: {n/dt:.1f} qps "
              f"({b.batches_run} batches)", flush=True)
    finally:
        b.close()


if __name__ == "__main__":
    main()
