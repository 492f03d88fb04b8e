"""Isolated MLP sub-block kernel ladder (real TPU).

Times, at ViT-B-16 trunk shapes (B=128, S=197, W=768, F=3072, bf16) and
text-tower shapes (S=77, W=512, F=2048):
  A. XLA sub-block formula (the r2 production path)
  B. mlp_subblock kernel at several hidden-chunk splits
  C. in-trunk effect: 12-layer trunk with/without the kernel

Sync discipline matches trunk_probe.py (host readback; best-of-3).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from fashionern_aaai2024_tpu.ops.mlp import _mlp_diff, _mlp_ref


def sync(x):
    return np.asarray(x[..., :1])


def timeit(fn, *args, iters=20, windows=3):
    out = fn(*args)
    sync(out)
    sync(fn(*args))
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def args_for(b, s, w, f, g):
    mk = lambda *shape: jnp.asarray(
        g.standard_normal(shape) * 0.05, jnp.bfloat16)
    return (jnp.asarray(g.standard_normal((b, s, w)), jnp.bfloat16),
            mk(w) + 1, mk(w), mk(w, f), mk(f), mk(f, w), mk(w))


def main():
    g = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)

    for (b, s, w, f, tag) in [
        (128, 197, 768, 3072, "ViT-B trunk"),
        (256, 197, 768, 3072, "ViT-B trunk B=256"),
        (128, 77, 512, 2048, "text tower"),
        (512, 77, 512, 2048, "text tower B=512"),
    ]:
        a = args_for(b, s, w, f, g)
        fl = 2 * b * s * w * f * 2  # two matmuls
        xla = jax.jit(lambda *a_: _mlp_ref(*a_, "quick_gelu", 1e-5))
        t = timeit(xla, *a)
        print(f"[{tag}] XLA sub-block: {t*1e3:.3f} ms  {fl/t/1e12:.1f} TF/s",
              flush=True)
        for splits in (1, 2, 4):
            if f % splits or (f // splits) % 128:
                continue
            for gb in (1, 2, 4, 8):
                if b % gb:
                    continue
                try:
                    k = jax.jit(lambda *a_, sp=splits, g_=gb: _mlp_diff(
                        *a_, "quick_gelu", 1e-5, sp, g_, False))
                    t = timeit(k, *a)
                    print(f"[{tag}] kernel splits={splits} gb={gb}: "
                          f"{t*1e3:.3f} ms  {fl/t/1e12:.1f} TF/s", flush=True)
                except Exception as e:
                    print(f"[{tag}] kernel splits={splits} gb={gb}: FAILED "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
