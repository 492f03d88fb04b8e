"""Isolate micro-batcher overhead from batched-dispatch cost.

The serve_latency load test measured 64 concurrent b=1 queries → 5
coalesced batches but only 1.4× the serialized qps; each ~13-item batch
cost ~550 ms while a b=1 dispatch cost 60 ms in the same process.
This probe separates the suspects, same-process interleaved A/B:
  (a) svc.query b=1 serial     — per-dispatch floor
  (b) svc.query b=32 direct    — batched dispatch cost, no batcher
  (c) MicroBatcher, 64 conc.   — adds queueing + thread handoff
"""

from __future__ import annotations

import time

import jax
import numpy as np

from benchmarks.serve_latency import fake_tokenizer
from fashionern_aaai2024_tpu.data.loader import Loader
from fashionern_aaai2024_tpu.models.clip.config import get_clip_config
from fashionern_aaai2024_tpu.models.composed import ComposedCIRModel
from fashionern_aaai2024_tpu.retrieval import evaluate as E
from fashionern_aaai2024_tpu.retrieval.server import (
    MicroBatcher, RetrievalService,
)


def build_service():
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
    items = [{"name": f"img{i}",
              "image": g.random((v.image_size, v.image_size, 3),
                                dtype=np.float32),
              "patch": g.standard_normal((13, cfg.feature_dim))
                        .astype(np.float32)}
             for i in range(128)]
    t0 = time.time()
    svc = RetrievalService(api, Loader(items, 32, num_workers=0))
    print(f"startup: {time.time()-t0:.1f}s", flush=True)
    return svc


def main():
    print("devices:", jax.devices(), flush=True)
    svc = build_service()
    reqs = [(f"img{i % 128}", f"a red dress with belt {i}", 10)
            for i in range(64)]

    def leg_serial(n=16):
        t0 = time.perf_counter()
        for r, c, k in reqs[:n]:
            svc.query([r], [c], k=k)
        dt = time.perf_counter() - t0
        print(f"(a) serial b=1 x{n}: {dt/n*1e3:.1f} ms/q  "
              f"{n/dt:.1f} qps", flush=True)

    def leg_direct32(iters=4):
        refs = [r for r, _, _ in reqs[:32]]
        caps = [c for _, c, _ in reqs[:32]]
        svc.query(refs, caps, k=10)  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            svc.query(refs, caps, k=10)
        dt = time.perf_counter() - t0
        print(f"(b) direct b=32 x{iters}: {dt/iters*1e3:.1f} ms/batch  "
              f"{32*iters/dt:.1f} qps", flush=True)

    def leg_batcher(n=64):
        import concurrent.futures as futures
        b = MicroBatcher(svc, max_batch=32, max_wait_ms=2.0)
        try:
            with futures.ThreadPoolExecutor(32) as pool:  # warm
                list(pool.map(lambda r: b.submit(*r), reqs[:32]))
            t0 = time.perf_counter()
            with futures.ThreadPoolExecutor(32) as pool:
                list(pool.map(lambda r: b.submit(*r), reqs))
            dt = time.perf_counter() - t0
            print(f"(c) batcher x{n} conc: {n/dt:.1f} qps "
                  f"({b.batches_run} batches, "
                  f"{dt/max(1,b.batches_run)*1e3:.0f} ms/batch)",
                  flush=True)
        finally:
            b.close()

    # interleave: a b c a b c — so a window-long tunnel slowdown hits
    # every leg, not just the last one
    for round_ in range(2):
        print(f"--- window {round_} ---", flush=True)
        leg_serial()
        leg_direct32()
        leg_batcher()


if __name__ == "__main__":
    main()
