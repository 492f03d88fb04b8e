"""Top-k retrieval search ladder: where does the 200k-gallery search time go?

The reference materializes the full Q x N distance matrix and argsorts
it per query (`/root/reference/run/valid/validate_fiq.py:34-35`). Our
r1 answer (`ops/similarity.blocked_top_k_similarity`) replaced that
with a blocked MXU matmul + one `lax.top_k` — 25k q/s at N=200k,
Q=1024, k=51, d=640. This probe separates the matmul from the
selection cost and measures the TPU-native selection primitive
(`jax.lax.approx_max_k`, the hardware PartialReduce op) plus an
exactness-verified two-pass built on it.

Run on the chip:  python benchmarks/topk_probe.py [--n 200000] [--q 1024]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def bench_fn(f, *args, iters=10, warm=2):
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


def make_data(n, q, d, seed=0):
    g = np.random.default_rng(seed)
    gal = g.standard_normal((n, d), dtype=np.float32)
    gal /= np.linalg.norm(gal, axis=1, keepdims=True)
    qs = g.standard_normal((q, d), dtype=np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    return jnp.asarray(qs), jnp.asarray(gal)


@functools.partial(jax.jit, static_argnames=())
def matmul_only(q, gal):
    s = jnp.dot(q, gal.T)  # fp32
    return jnp.max(s, axis=1)


@jax.jit
def matmul_bf16_only(q, gal):
    s = jnp.dot(q.astype(jnp.bfloat16), gal.astype(jnp.bfloat16).T,
                preferred_element_type=jnp.float32)
    return jnp.max(s, axis=1)


@functools.partial(jax.jit, static_argnames=("k",))
def full_topk(q, gal, k=51):
    s = jnp.dot(q, gal.T)
    return jax.lax.top_k(s, k)


@functools.partial(jax.jit, static_argnames=("k", "recall"))
def approx_topk(q, gal, k=51, recall=0.95):
    s = jnp.dot(q, gal.T)
    return jax.lax.approx_max_k(s, k, recall_target=recall)


@functools.partial(jax.jit, static_argnames=("k", "m"))
def verified_exact_topk(q, gal, k=51, m=256):
    """Approx candidate pass -> exact top-k over candidates -> global
    count(score > tau) certifies value-exactness; rare-miss fallback to
    the full sort. See ops/similarity.py for the production version."""
    s = jnp.dot(q, gal.T)
    cand_s, cand_i = jax.lax.approx_max_k(s, m, recall_target=0.95)
    top_s, pos = jax.lax.top_k(cand_s, k)
    top_i = jnp.take_along_axis(cand_i, pos, axis=1)
    tau = top_s[:, k - 1]
    n_above = jnp.sum(s > tau[:, None], axis=1)
    ok = jnp.all(n_above <= k - 1)

    def fallback(_):
        fs, fi = jax.lax.top_k(s, k)
        return fs, fi

    def keep(_):
        return top_s, top_i

    return jax.lax.cond(ok, keep, fallback, None), ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--q", type=int, default=1024)
    ap.add_argument("--d", type=int, default=640)
    ap.add_argument("--k", type=int, default=51)
    args = ap.parse_args()
    n, qn, d, k = args.n, args.q, args.d, args.k
    q, gal = make_data(n, qn, d)

    rows = {}

    def rec(name, dt, extra=""):
        rows[name] = dt
        print(json.dumps({"variant": name, "ms": round(dt * 1e3, 2),
                          "qps": round(qn / dt), "extra": extra}))

    from fashionern_aaai2024_tpu.ops.similarity import blocked_top_k_similarity

    rec("exact_blocked(prod)", bench_fn(
        lambda a, b: blocked_top_k_similarity(a, b, k=k), q, gal))
    rec("matmul_only_fp32", bench_fn(matmul_only, q, gal))
    rec("matmul_only_bf16", bench_fn(matmul_bf16_only, q, gal))
    rec("full_lax_topk", bench_fn(lambda a, b: full_topk(a, b, k=k), q, gal))
    for recall in (0.9, 0.95, 0.99):
        name = f"approx_prod(r={recall})"
        dt = bench_fn(
            lambda a, b, r=recall: blocked_top_k_similarity(
                a, b, k=k, approx_recall=r), q, gal)
        # measured recall vs exact
        es, ei = full_topk(q, gal, k=k)
        as_, ai = blocked_top_k_similarity(q, gal, k=k, approx_recall=recall)
        ei_np, ai_np = np.asarray(ei), np.asarray(ai)
        hits = np.mean([len(set(ei_np[i]) & set(ai_np[i])) / k
                        for i in range(qn)])
        rec(name, dt, extra=f"measured_recall={hits:.4f}")
    for m in (128, 256, 512):
        (vs, vi), ok = verified_exact_topk(q, gal, k=k, m=m)
        es, ei = full_topk(q, gal, k=k)
        exact = bool(np.array_equal(np.asarray(vi), np.asarray(ei)))
        dt = bench_fn(lambda a, b, mm=m: verified_exact_topk(a, b, k=k, m=mm),
                      q, gal)
        rec(f"verified_exact(m={m})", dt,
            extra=f"cert_ok={bool(ok)} idx_match_full_sort={exact}")

    base = rows["exact_blocked(prod)"]
    for name, dt in rows.items():
        print(f"{name:28s} {dt*1e3:8.2f} ms  {base/dt:5.2f}x")


if __name__ == "__main__":
    main()
