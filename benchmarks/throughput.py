"""Full throughput suite (manual; the driver runs bench.py instead).

Measures, on the current JAX backend:
  * gallery images/sec embedded (encode_image + index tower) — ViT-B-16
    and RN50x4
  * composed queries/sec (text encode + DVR query tower) — the
    BASELINE.json primary metric
  * train steps/sec (full pjit step, frozen CLIP fwd + fusion fwd/bwd)

Prints one JSON line per measurement. Sync is host readback (through
the axon tunnel `block_until_ready` returns early — see bench.py).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def bench_fn(f, *args, iters=20, warm=2):
    for _ in range(warm):
        _sync(f(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _cast16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree
    )


def build(model_name: str, bf16: bool):
    from fashionern_aaai2024_tpu.models.clip.config import get_clip_config
    from fashionern_aaai2024_tpu.models.composed import ComposedCIRModel

    cfg = get_clip_config(model_name, activation="quick_gelu")
    model = ComposedCIRModel(cfg, patch_num=13)
    rng = jax.random.PRNGKey(0)
    v = cfg.vision
    variables = model.init(
        {"params": rng, "dropout": rng},
        np.zeros((2, v.image_size, v.image_size, 3), np.float32),
        np.zeros((2, v.image_size, v.image_size, 3), np.float32),
        np.zeros((2, cfg.text.context_length), np.int32),
        np.zeros((2, 13, cfg.feature_dim), np.float32),
        np.zeros((2, 13, cfg.feature_dim), np.float32),
        deterministic=False, method=model.train_forward,
    )
    if bf16:
        variables = _cast16(variables)
    return cfg, model, variables


def gallery_bench(model_name: str, batch: int, bf16: bool = True) -> dict:
    cfg, model, variables = build(model_name, bf16)
    dt_img = jnp.bfloat16 if bf16 else jnp.float32

    @jax.jit
    def embed_and_refine(variables, images, patches):
        g, _ = model.apply(variables, images, method=model.encode_image)
        g = g.astype(jnp.float32)
        g = g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-12)
        return model.apply(variables, g, patches, method=model.index)

    g = np.random.default_rng(0)
    images = jnp.asarray(
        g.random((batch, cfg.input_dim, cfg.input_dim, 3), dtype=np.float32), dt_img)
    patches = jnp.asarray(g.standard_normal((batch, 13, cfg.feature_dim)), dt_img)
    dt = bench_fn(embed_and_refine, variables, images, patches)
    return {
        "metric": f"gallery_images_per_sec_{model_name}",
        "value": round(batch / dt, 2),
        "unit": "images/sec",
        "batch": batch,
    }


def query_bench(model_name: str, batch: int, bf16: bool = True) -> dict:
    cfg, model, variables = build(model_name, bf16)
    dt_f = jnp.bfloat16 if bf16 else jnp.float32

    @jax.jit
    def composed_query(variables, text_ids, ref_feats, ref_patch):
        tg, ts = model.apply(variables, text_ids, method=model.encode_text)
        return model.apply(variables, ref_feats, ref_patch, tg, ts,
                           method=model.query)

    g = np.random.default_rng(0)
    ids = np.zeros((batch, cfg.text.context_length), np.int32)
    ids[:, 0] = 1
    ids[:, 1:20] = g.integers(2, 1000, (batch, 19))
    ref_feats = jnp.asarray(g.standard_normal((batch, cfg.feature_dim)), dt_f)
    ref_patch = jnp.asarray(g.standard_normal((batch, 13, cfg.feature_dim)), dt_f)
    dt = bench_fn(composed_query, variables, jnp.asarray(ids), ref_feats, ref_patch)
    return {
        "metric": f"composed_queries_per_sec_{model_name}",
        "value": round(batch / dt, 2),
        "unit": "queries/sec",
        "batch": batch,
    }


def train_bench(model_name: str, batch: int, precision: str = "fp32") -> dict:
    import optax

    from fashionern_aaai2024_tpu.parallel import mesh as meshlib
    from fashionern_aaai2024_tpu.train.state import (
        cast_frozen_clip_bf16, create_train_state,
    )
    from fashionern_aaai2024_tpu.train.step import build_train_step

    cfg, model, variables = build(model_name, bf16=False)
    opt = optax.adam(4e-5)
    state = create_train_state(variables, opt, jax.random.PRNGKey(1))
    if precision == "bf16":
        state = cast_frozen_clip_bf16(state)
    mesh = meshlib.create_mesh()
    step = build_train_step(model, opt, negatives="local",
                            local_groups=mesh.shape[meshlib.DATA_AXIS],
                            donate=False)
    g = np.random.default_rng(0)
    v = cfg.vision
    img_dt = jnp.bfloat16 if precision == "bf16" else np.float32
    batch_arrays = meshlib.shard_batch(mesh, {
        "ref_image": g.random((batch, v.image_size, v.image_size, 3),
                              dtype=np.float32).astype(img_dt),
        "tar_image": g.random((batch, v.image_size, v.image_size, 3),
                              dtype=np.float32).astype(img_dt),
        "text_ids": g.integers(0, 1000, (batch, cfg.text.context_length)).astype(np.int32),
        "ref_patch": g.standard_normal((batch, 13, cfg.feature_dim), dtype=np.float32),
        "tar_patch": g.standard_normal((batch, 13, cfg.feature_dim), dtype=np.float32),
    })

    def run(state, batch):
        s, loss = step(state, batch)
        return loss

    dt = bench_fn(run, state, batch_arrays, iters=5)
    return {
        "metric": f"train_samples_per_sec_{model_name}_{precision}",
        "value": round(batch / dt, 2),
        "unit": "samples/sec",
        "batch": batch,
    }


def search_bench(n_gallery: int = 200_000, n_queries: int = 1024,
                 dim: int = 640, k: int = 51, int8: bool = False,
                 approx_recall: float | None = None) -> dict:
    """Retrieval matmul + running top-k over a Fashion200k-scale gallery
    (`ops.similarity.blocked_top_k_similarity`; `--int8` uses the
    quantized-gallery path, `ops.quant`; `approx_recall` the TPU
    approx_max_k serving tier)."""
    from fashionern_aaai2024_tpu.ops.quant import (
        blocked_top_k_similarity_int8, quantize_rows,
    )
    from fashionern_aaai2024_tpu.ops.similarity import blocked_top_k_similarity

    g = np.random.default_rng(0)
    gal = jnp.asarray(g.standard_normal((n_gallery, dim)).astype(np.float32))
    q = jnp.asarray(g.standard_normal((n_queries, dim)).astype(np.float32))

    if int8:
        gal_q, scales = quantize_rows(gal)

        @jax.jit
        def search(q):
            return blocked_top_k_similarity_int8(
                q, gal_q, scales, k=k, approx_recall=approx_recall)

        dt = bench_fn(search, q, iters=10)
    else:
        @jax.jit
        def search(q, gal):
            return blocked_top_k_similarity(
                q, gal, k=k, approx_recall=approx_recall)

        dt = bench_fn(search, q, gal, iters=10)
    suffix = ("_int8" if int8 else "") + (
        f"_approx{approx_recall}" if approx_recall else "")
    return {
        "metric": f"retrieval_queries_per_sec_n{n_gallery}_d{dim}{suffix}",
        "value": round(n_queries / dt, 2),
        "unit": "queries/sec",
        "batch": n_queries,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--suite", default="all",
                   choices=["all", "gallery", "query", "train", "search"])
    p.add_argument("--model", default="ViT-B-16")
    p.add_argument("--batch", default=128, type=int)
    p.add_argument("--precision", default="fp32", choices=["fp32", "bf16"])
    args = p.parse_args()
    if args.suite in ("all", "gallery"):
        print(json.dumps(gallery_bench(args.model, args.batch)))
    if args.suite in ("all", "query"):
        print(json.dumps(query_bench(args.model, args.batch)))
    if args.suite in ("all", "train"):
        print(json.dumps(train_bench(args.model, args.batch,
                                     precision=args.precision)))
    if args.suite == "search":
        print(json.dumps(search_bench()))
        print(json.dumps(search_bench(int8=True)))
        print(json.dumps(search_bench(approx_recall=0.95)))
        print(json.dumps(search_bench(int8=True, approx_recall=0.95)))


if __name__ == "__main__":
    main()
