"""Whole-block kernel ladder (real TPU): text-tower shapes
[B, 77, 512] causal bf16 — whole-block kernel vs the attention+MLP
sub-block pair vs plain XLA, isolated and in a 12-layer trunk; plus
composed-query relevance (text trunk time at B=256)."""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from fashionern_aaai2024_tpu.ops import block as blk

W, S, L, H = 512, 77, 12, 8


def sync(x):
    return np.asarray(x[..., :1])


def timeit(fn, *args, iters=20, windows=3):
    sync(fn(*args))
    sync(fn(*args))
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def args_for(b, g):
    mk = lambda *sh: jnp.asarray(g.standard_normal(sh) * 0.05, jnp.bfloat16)
    return (jnp.asarray(g.standard_normal((b, S, W)), jnp.bfloat16),
            mk(W) + 1, mk(W), mk(W, 3 * W), mk(3 * W), mk(W, W), mk(W),
            mk(W) + 1, mk(W), mk(W, 4 * W), mk(4 * W), mk(4 * W, W), mk(W))


def main():
    g = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)

    for B in (128, 256, 512):
        a = args_for(B, g)
        variants = [
            ("whole-block", functools.partial(
                blk.transformer_block, heads=H, causal=True,
                force_pallas=True)),
            ("subblock-pair", functools.partial(
                blk.transformer_block, heads=H, causal=True,
                force_pallas=False)),
        ]
        for tag, fn in variants:
            f = jax.jit(lambda *a_, fn_=fn: fn_(*a_))
            t = timeit(f, *a)
            print(f"B={B} {tag}: {t*1e3:.3f} ms/layer", flush=True)

        # 12-layer trunk
        for tag, fp in [("whole-block", True), ("subblock-pair", False)]:
            def trunk(*a_, fp_=fp):
                x = a_[0]
                for _ in range(L):
                    x = blk.transformer_block(x, *a_[1:], heads=H,
                                              causal=True, force_pallas=fp_)
                return x

            f = jax.jit(trunk)
            t = timeit(f, *a, iters=8)
            print(f"B={B} trunk12 {tag}: {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
