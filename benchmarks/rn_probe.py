"""RN50x4 serving probe (real TPU) — the r2 gap: "2,434 img/s with zero
RN-specific ledger entries".

Regions + variants, same-process A/Bs at B=64/128 bf16 288²:
  A. full encode (pooled + tokens) — the InferenceAPI program
  B. pooled-only program (tokens path DCE'd by XLA?)
  C. fold_batchnorm weights vs raw
  D. stem only / trunk(stages) only / attnpool only
  E. fp32 control at B=64

Sync: host readback, best-of-3 windows.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from fashionern_aaai2024_tpu.models.clip.config import get_clip_config
from fashionern_aaai2024_tpu.models.clip import resnet as R


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0][..., :1])


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


def cast_bf16(v):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v)


def main():
    print("devices:", jax.devices(), flush=True)
    g = np.random.default_rng(0)
    cfg = get_clip_config("RN50x4")
    m = R.ModifiedResNet(cfg.vision)
    x32 = np.asarray(g.random((128, 288, 288, 3)), np.float32)
    v = m.init(jax.random.PRNGKey(0), x32[:2])
    # non-trivial BN stats so folding is not an identity
    import flax

    stats = flax.traverse_util.flatten_dict(v["batch_stats"])
    rs = np.random.default_rng(7)
    stats = {k: jnp.asarray(np.abs(rs.standard_normal(s.shape)) * 0.3 + 0.7,
                            np.float32) if k[-1] == "var"
             else jnp.asarray(rs.standard_normal(s.shape) * 0.1, np.float32)
             for k, s in stats.items()}
    v = {"params": v["params"],
         "batch_stats": flax.traverse_util.unflatten_dict(stats)}
    vb = cast_bf16(v)
    vb_folded = cast_bf16(R.fold_batchnorm(v))

    enc_full = jax.jit(lambda v_, x_: m.apply(v_, x_))
    enc_pooled = jax.jit(lambda v_, x_: m.apply(v_, x_)[0])

    for B in (64, 128):
        xb = jnp.asarray(x32[:B], jnp.bfloat16)
        t = timeit(enc_full, vb, xb)
        print(f"A. full encode B={B}: {t*1e3:.2f} ms ({B/t:.0f} img/s)",
              flush=True)
        t = timeit(enc_pooled, vb, xb)
        print(f"B. pooled-only B={B}: {t*1e3:.2f} ms ({B/t:.0f} img/s)",
              flush=True)
        t = timeit(enc_pooled, vb_folded, xb)
        print(f"C. pooled-only folded-BN B={B}: {t*1e3:.2f} ms "
              f"({B/t:.0f} img/s)", flush=True)

    # D. region split at B=128: conv stack = pooled-only minus attnpool
    # (flax compact modules can't be re-entered with a surgical method,
    # so the split is by differencing); plus XLA's own FLOP count for an
    # honest achieved-TF/s figure
    xb = jnp.asarray(x32[:128], jnp.bfloat16)
    comp = enc_pooled.lower(vb, xb).compile()
    ca = comp.cost_analysis()
    flops = (ca[0] if isinstance(ca, (list, tuple)) else ca)["flops"]
    t = timeit(enc_pooled, vb, xb)
    print(f"D. pooled-only B=128: {t*1e3:.2f} ms, XLA-counted "
          f"{flops/128/1e9:.2f} GF/img -> {flops/t/1e12:.1f} TF/s achieved",
          flush=True)

    ap = R.AttentionPool2d(embed_dim=2560, num_heads=40, output_dim=640)
    xa = jnp.asarray(np.asarray(g.standard_normal((128, 9, 9, 2560)),
                                np.float32) * 0.05, jnp.bfloat16)
    va = cast_bf16(ap.init(jax.random.PRNGKey(0), xa[:2]))
    t = timeit(jax.jit(lambda v_, x_: ap.apply(v_, x_)[0]), va, xa)
    print(f"D. attnpool pooled-only B=128: {t*1e3:.2f} ms", flush=True)

    # E. fp32 control
    xf = jnp.asarray(x32[:64], jnp.float32)
    t = timeit(enc_pooled, v, xf)
    print(f"E. fp32 pooled-only B=64: {t*1e3:.2f} ms ({64/t:.0f} img/s)",
          flush=True)


if __name__ == "__main__":
    main()
