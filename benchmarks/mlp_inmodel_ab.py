"""Same-day A/B: ViT-B-16 trunk with vs without the MLP sub-block
kernel (chip throughput varies day to day, so only same-process pairs
are comparable — r2 lesson)."""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from fashionern_aaai2024_tpu.models.clip import transformer as T

W, S, L, H = 768, 197, 12, 12


def sync(x):
    return np.asarray(x[..., :1])


def timeit(fn, *args, iters=10, windows=3):
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


def flops(b):
    return b * (L * (2 * S * W * W * (3 + 1 + 8) + 4 * S * S * W))


def main():
    g = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)
    a = jnp.asarray(g.standard_normal((8192, 8192)), jnp.bfloat16)
    t = timeit(jax.jit(lambda a: a @ a), a)
    print(f"roofline 8192^3: {2*8192**3/t/1e12:.1f} TF/s", flush=True)

    trunk = T.Transformer(W, L, H, "quick_gelu")
    xt0 = jnp.asarray(g.standard_normal((2, S, W)), jnp.bfloat16)
    tvars = trunk.init(jax.random.PRNGKey(0), xt0)
    tvars = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        tvars)

    real = T.mlp_subblock

    for B in (128, 256):
        xt = jnp.asarray(g.standard_normal((B, S, W)), jnp.bfloat16)
        for tag, fn in [
            ("mlp-kernel ", real),
            ("mlp-xla    ", functools.partial(real, force_pallas=False)),
        ]:
            T.mlp_subblock = fn
            f = jax.jit(lambda v_, x_: trunk.apply(v_, x_))
            t = timeit(f, tvars, xt)
            print(f"B={B} {tag}: {t*1e3:.2f} ms  {flops(B)/t/1e12:.1f} TF/s",
                  flush=True)
        T.mlp_subblock = real


if __name__ == "__main__":
    main()
