"""Fusion-stack & RN50x4-head attention ledger (real TPU).

Closes the r2 gap: "no ledger entries proving the dispatch position at
the fusion sites". Measures, same-process A/B (Pallas tier vs XLA
formula), at production shapes:

  1. DVR query fusion (mini-BERT S=91 + MR cross-attn Sq=77/Sk=13 +
     SR/combiners), d=512 (dh=64 → packed tiers) and d=640 (dh=80 →
     XLA tier by dispatch), fp32 (the fusion stack's production dtype)
     at B=256.
  2. RN50x4 attention pool isolated (Sq=1, Sk=82, E=2560, 40 heads),
     bf16, B=64/128.
  3. RN50x4 full encode img/s (the tower the reference uses for 4 of
     its 5 recipes) — before/after context for the serving pass.

Sync discipline: host readback, best-of-3 windows.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from fashionern_aaai2024_tpu.models.clip import resnet as resnet_mod
from fashionern_aaai2024_tpu.models.ern import fusion as fusion_mod
from fashionern_aaai2024_tpu.models.ern import layers as layers_mod
from fashionern_aaai2024_tpu.ops import attention as attn_mod


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0][..., :1])


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


def probe_dvr(d, b=256):
    g = np.random.default_rng(0)
    m = fusion_mod.DVRModule(feature_dim=d)
    args = (jnp.asarray(g.standard_normal((b, 13, d)), jnp.float32),
            jnp.asarray(g.standard_normal((b, 77, d)), jnp.float32),
            jnp.asarray(g.standard_normal((b, d)), jnp.float32),
            jnp.asarray(g.standard_normal((b, d)), jnp.float32))
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
               *jax.tree_util.tree_map(lambda x: x[:2], args),
               deterministic=False)
    v = {"params": v["params"], "batch_stats": v.get("batch_stats", {})}

    real_fused = fusion_mod.fused_qkv_self_attention
    real_cross = attn_mod.packed_kv_cross_attention

    for tag, force in [("pallas-tier", None), ("xla-forced ", False)]:
        if force is None:
            fusion_mod.fused_qkv_self_attention = real_fused
            attn_mod.packed_kv_cross_attention = real_cross
        else:
            fusion_mod.fused_qkv_self_attention = functools.partial(
                real_fused, force_pallas=False)
            attn_mod.packed_kv_cross_attention = functools.partial(
                real_cross, force_pallas=False)
        f = jax.jit(lambda v_, *a: m.apply(v_, *a, deterministic=True))
        t = timeit(f, v, *args)
        print(f"DVR d={d} B={b} {tag}: {t*1e3:.3f} ms  ({b/t:.0f} q/s)",
              flush=True)
    fusion_mod.fused_qkv_self_attention = real_fused
    attn_mod.packed_kv_cross_attention = real_cross


def probe_attnpool(b):
    g = np.random.default_rng(1)
    m = resnet_mod.AttentionPool2d(embed_dim=2560, num_heads=40, output_dim=640)
    x = jnp.asarray(g.standard_normal((b, 9, 9, 2560)) * 0.05, jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), x[:2])
    v = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v)
    real = resnet_mod.packed_kv_cross_attention
    for tag, fn in [("pallas-tier", real),
                    ("xla-forced ", functools.partial(real, force_pallas=False))]:
        resnet_mod.packed_kv_cross_attention = fn
        f = jax.jit(lambda v_, x_: m.apply(v_, x_))
        t = timeit(f, v, x)
        print(f"attnpool B={b} {tag}: {t*1e3:.3f} ms", flush=True)
    resnet_mod.packed_kv_cross_attention = real


def probe_rn_encode(b):
    from fashionern_aaai2024_tpu.models.clip.config import get_clip_config

    g = np.random.default_rng(2)
    cfg = get_clip_config("RN50x4")
    m = resnet_mod.ModifiedResNet(cfg.vision)
    x = np.asarray(g.random((b, 288, 288, 3)), np.float32)
    v = m.init(jax.random.PRNGKey(0), x[:2])
    v = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v)
    xb = jnp.asarray(x, jnp.bfloat16)
    f = jax.jit(lambda v_, x_: m.apply(v_, x_)[0])
    t = timeit(f, v, xb, iters=10)
    print(f"RN50x4 encode B={b}: {t*1e3:.2f} ms  ({b/t:.0f} img/s)", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    probe_dvr(512)
    probe_dvr(640)
    probe_attnpool(64)
    probe_attnpool(128)
    probe_rn_encode(64)
    probe_rn_encode(128)


if __name__ == "__main__":
    main()
