"""Approx-top-k recall across REALISTIC embedding distributions
(VERDICT r3 item 4).

`lax.approx_max_k(recall_target=R)` is calibrated on uniform random
score distributions; the r3 ledger measured 0.984 @ R=0.95 on exactly
that (gaussian gallery). Real CLIP embeddings are clustered and
anisotropic — scores near the top-k boundary are denser, so the
hardware PartialReduce can drop more true members. This probe measures
the approx tier's ACTUAL recall (overlap with exact top-k) on three
distributions:

  gaussian   — i.i.d. normal rows, L2-normalized (the easy baseline)
  clusters   — mixture of 32 tight clusters + strong low-rank
               anisotropy (the synthetic worst case: most of the
               gallery is nearly equidistant from a query)
  vit-feats  — actual ViT-B-16 CLIP image features of structured
               images (random-init weights; random-init CLIP features
               concentrate on a tiny cone — measured cosine spread is
               far tighter than trained CLIP, an even harder case)

plus queries drawn near gallery points (the composed-retrieval case:
predictions land near their targets). Run on the chip:

  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/topk_recall_probe.py
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def gaussian(n, d, g):
    x = g.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def clusters(n, d, g, k_clusters=32, spread=0.05, rank=16):
    """Tight clusters + low-rank anisotropy: rows concentrate near a
    rank-`rank` subspace, within-cluster spread `spread`."""
    centers = g.standard_normal((k_clusters, d)).astype(np.float32)
    proj = g.standard_normal((d, rank)).astype(np.float32)
    basis = proj @ proj.T / rank  # low-rank smoother
    centers = centers @ basis + 0.1 * centers
    assign = g.integers(0, k_clusters, n)
    x = centers[assign] + spread * g.standard_normal((n, d)).astype(np.float32)
    return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)


def vit_features(n, d, g, batch=128):
    """Real CLIP image-tower features of structured (blockwise-constant)
    images — the model's actual output distribution."""
    import jax

    from fashionern_aaai2024_tpu.models.clip.config import get_clip_config
    from fashionern_aaai2024_tpu.models.composed import ComposedCIRModel

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
    encode = jax.jit(lambda va, im: model.apply(va, im,
                                                method=model.encode_image)[0])
    feats = []
    for i in range(0, n, batch):
        m = min(batch, n - i)
        # structured images: 8x8 color blocks upsampled (photo-like
        # low-frequency content, not white noise)
        small = g.random((m, 8, 8, 3), np.float32)
        imgs = np.repeat(np.repeat(small, v.image_size // 8, 1),
                         v.image_size // 8, 2)
        f = np.asarray(encode(variables, imgs.astype(np.float32)),
                       np.float32)
        feats.append(f)
    x = np.concatenate(feats)[:n]
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def main():
    import jax.numpy as jnp

    from fashionern_aaai2024_tpu.ops.similarity import (
        blocked_top_k_similarity, measured_approx_recall,
    )

    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=200_000)
    p.add_argument("--d", type=int, default=640)
    p.add_argument("--q", type=int, default=512)
    p.add_argument("--k", type=int, default=51)
    p.add_argument("--vit-n", type=int, default=20_000)
    args = p.parse_args()
    g = np.random.default_rng(0)

    dists = {
        "gaussian": gaussian(args.n, args.d, g),
        "clusters": clusters(args.n, args.d, g),
        "vit_feats": vit_features(args.vit_n, 512, g),
    }
    targets = [0.80, 0.90, 0.95, 0.99]
    table = {}
    for name, gal in dists.items():
        # distribution hardness diagnostic: cosine spread of the gallery
        ns = min(512, gal.shape[0])
        sample = gal[g.choice(gal.shape[0], ns, replace=False)]
        cos = sample @ sample.T
        off = cos[~np.eye(ns, dtype=bool)]
        row = {"cos_mean": round(float(off.mean()), 4),
               "cos_p99": round(float(np.quantile(off, 0.99)), 4)}
        for t in targets:
            r = measured_approx_recall(jnp.asarray(gal), k=args.k,
                                       recall_target=t,
                                       n_queries=args.q)
            row[f"R{t}"] = round(r, 4)
        table[name] = row
        print(json.dumps({name: row}), flush=True)
    print(json.dumps({"n": args.n, "k": args.k, "table": table}))


if __name__ == "__main__":
    main()
