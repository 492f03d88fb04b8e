"""int8 MLP sub-block ladder (real TPU, ViT-B trunk shapes):

  A. bf16 MLP sub-block kernel (the r3 production path)
  B. int8 XLA formula (the r2 --quantize-towers path)
  C. int8 fused kernel (this round)
  D. in-trunk: 12-layer quantized trunk, XLA-int8 MLP vs fused-int8 MLP
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from fashionern_aaai2024_tpu.ops import mlp as mlp_mod
from fashionern_aaai2024_tpu.ops import qmlp as qmlp_mod


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


def main():
    g = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)
    for (b, s, w, f, tag) in [(128, 197, 768, 3072, "ViT-B"),
                              (256, 197, 768, 3072, "ViT-B B=256")]:
        mk = lambda *sh: jnp.asarray(g.standard_normal(sh) * 0.05,
                                     jnp.bfloat16)
        a = (jnp.asarray(g.standard_normal((b, s, w)), jnp.bfloat16),
             mk(w) + 1, mk(w), mk(w, f), mk(f), mk(f, w), mk(w))
        fl = 2 * b * s * w * f * 2
        rows = [
            ("bf16 kernel ", jax.jit(functools.partial(
                mlp_mod.mlp_subblock, activation="quick_gelu"))),
            ("int8 XLA    ", jax.jit(functools.partial(
                qmlp_mod.int8_mlp_subblock, activation="quick_gelu",
                force_pallas=False))),
            ("int8 kernel ", jax.jit(functools.partial(
                qmlp_mod.int8_mlp_subblock, activation="quick_gelu",
                force_pallas=True))),
        ]
        for name, fn in rows:
            try:
                t = timeit(fn, *a)
                print(f"[{tag}] {name}: {t*1e3:.3f} ms  {fl/t/1e12:.1f} "
                      f"TF(mac)/s", flush=True)
            except Exception as e:
                print(f"[{tag}] {name}: FAIL {type(e).__name__} "
                      f"{str(e)[:150]}", flush=True)

    # D. quantized trunk in-model
    from fashionern_aaai2024_tpu.models.clip.transformer import Transformer

    for quant in (False, True):
        trunk = Transformer(768, 12, 12, "quick_gelu", quantize_mlp=quant)
        xt = jnp.asarray(g.standard_normal((128, 197, 768)), jnp.bfloat16)
        tv = trunk.init(jax.random.PRNGKey(0), xt[:2])
        tv = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            tv)
        fj = jax.jit(lambda v_, x_: trunk.apply(v_, x_))
        t = timeit(fj, tv, xt, iters=10)
        print(f"trunk12 B=128 quantize={quant}: {t*1e3:.2f} ms", flush=True)


def attn_ladder():
    """int8-projection attention sub-block vs the bf16 sub-block kernel
    (run separately after main())."""
    import functools as ft

    from fashionern_aaai2024_tpu.ops import attention as attn_mod
    from fashionern_aaai2024_tpu.ops import qmlp as q

    g = np.random.default_rng(1)
    for b in (128, 256):
        s, w, heads = 197, 768, 12
        mk = lambda *sh: jnp.asarray(g.standard_normal(sh) * 0.05,
                                     jnp.bfloat16)
        a = (jnp.asarray(g.standard_normal((b, s, w)), jnp.bfloat16),
             mk(w) + 1, mk(w), mk(w, 3 * w), mk(3 * w), mk(w, w), mk(w))
        rows = [
            ("bf16 attn-subblock", jax.jit(lambda *a_: attn_mod.attention_subblock(
                *a_, heads))),
            ("int8 attn-subblock", jax.jit(lambda *a_: q.int8_attention_subblock(
                *a_, heads, force_pallas=True))),
        ]
        for name, fn in rows:
            t = timeit(fn, *a)
            print(f"B={b} {name}: {t*1e3:.3f} ms/layer", flush=True)

    # full quantized trunk (attn+mlp int8) vs bf16
    from fashionern_aaai2024_tpu.models.clip.transformer import Transformer

    for quant in (False, True):
        trunk = Transformer(768, 12, 12, "quick_gelu", quantize_mlp=quant)
        xt = jnp.asarray(g.standard_normal((128, 197, 768)), jnp.bfloat16)
        tv = trunk.init(jax.random.PRNGKey(0), xt[:2])
        tv = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            tv)
        fj = jax.jit(lambda v_, x_: trunk.apply(v_, x_))
        t = timeit(fj, tv, xt, iters=10)
        print(f"trunk12 B=128 full-int8={quant}: {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    import sys

    if "--attn" in sys.argv:
        attn_ladder()
    else:
        main()
