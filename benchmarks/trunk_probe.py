"""Trunk MFU probe (real TPU): where do the 177-89=88 TF/s go?

Times, on the single v5e chip:
  A. isolated big matmul (roofline re-check)
  B. the ViT-B-16 trunk's exact matmul chain, no attention/LN (synthetic)
  C. transformer trunk only (12 blocks on [B,197,768] bf16)
  D. full embed_and_refine (bench.py program) at B=128/256/512
  E. variant trunks: jax.nn.dot_product_attention, no-bias-add QKV, etc.

Sync discipline: host readback (axon tunnel returns early from
block_until_ready); best-of-3 windows.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from fashionern_aaai2024_tpu.models.clip.config import get_clip_config

W, S, L, H = 768, 197, 12, 12
DH = W // H


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0][..., :1])


def timeit(fn, *args, iters=10, windows=3):
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


def flops_per_image_trunk():
    # 12 layers: QKV 3SW^2*2 + out SW^2*2 + mlp 8SW^2*2 + scores 2*2*S^2*W
    per_layer = 2 * S * W * W * (3 + 1 + 8) + 4 * S * S * W
    return L * per_layer


def main():
    g = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)

    # --- A. roofline
    a = jnp.asarray(g.standard_normal((8192, 8192)), jnp.bfloat16)
    b = jnp.asarray(g.standard_normal((8192, 8192)), jnp.bfloat16)
    mm = jax.jit(lambda a, b: a @ b)
    t = timeit(mm, a, b)
    print(f"A. 8192^3 matmul: {2*8192**3/t/1e12:.1f} TF/s", flush=True)

    # --- B. matmul chain at trunk shapes (no attention/LN/residual)
    for B in (128, 256):
        rows = B * S
        x = jnp.asarray(g.standard_normal((rows, W)), jnp.bfloat16)
        w_qkv = jnp.asarray(g.standard_normal((W, 3 * W)), jnp.bfloat16)
        w_o = jnp.asarray(g.standard_normal((W, W)), jnp.bfloat16)
        w_fc = jnp.asarray(g.standard_normal((W, 4 * W)), jnp.bfloat16)
        w_pr = jnp.asarray(g.standard_normal((4 * W, W)), jnp.bfloat16)

        @jax.jit
        def chain(x, w_qkv, w_o, w_fc, w_pr):
            for _ in range(L):
                q = x @ w_qkv
                x = q[:, :W] @ w_o
                x = (x @ w_fc) @ w_pr
            return x

        t = timeit(chain, x, w_qkv, w_o, w_fc, w_pr)
        fl = L * 2 * rows * W * W * (3 + 1 + 8)
        print(f"B. matmul chain B={B}: {fl/t/1e12:.1f} TF/s  ({t*1e3:.2f} ms)",
              flush=True)

    # --- C/D/E need the model
    from fashionern_aaai2024_tpu.models.composed import ComposedCIRModel

    cfg = get_clip_config("ViT-B-16", activation="quick_gelu")
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
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)

    # --- C. transformer trunk only
    from fashionern_aaai2024_tpu.models.clip.transformer import Transformer

    trunk = Transformer(W, L, H, "quick_gelu")
    tvars = {"params": variables["params"]["clip"]["visual"]["transformer"]}

    for B in (128, 256):
        xt = jnp.asarray(g.standard_normal((B, S, W)), jnp.bfloat16)
        f = jax.jit(lambda v_, x_: trunk.apply(v_, x_))
        t = timeit(f, tvars, xt)
        fl = B * flops_per_image_trunk()
        print(f"C. trunk-only B={B}: {fl/t/1e12:.1f} TF/s  ({t*1e3:.2f} ms)",
              flush=True)

    # --- D. full embed_and_refine at several batch sizes
    @jax.jit
    def embed_and_refine(variables, images, patches):
        gf, _ = model.apply(variables, images, method=model.encode_image)
        gf = gf.astype(jnp.float32)
        gf = gf / (jnp.linalg.norm(gf, axis=-1, keepdims=True) + 1e-12)
        return model.apply(variables, gf, patches, method=model.index)

    for B in (128, 256, 512):
        images = jnp.asarray(
            g.random((B, v.image_size, v.image_size, 3), dtype=np.float32),
            jnp.bfloat16)
        patches = jnp.asarray(g.standard_normal((B, 13, cfg.feature_dim)),
                              jnp.bfloat16)
        t = timeit(embed_and_refine, variables, images, patches,
                   iters=max(4, 1024 // B))
        fl = B * flops_per_image_trunk()  # trunk FLOPs only, comparable scale
        print(f"D. full embed+refine B={B}: {B/t:.0f} img/s, trunk-equiv "
              f"{fl/t/1e12:.1f} TF/s  ({t*1e3:.2f} ms)", flush=True)

    # --- E. variant: jax.nn.dot_product_attention trunk
    import flax.linen as nn

    class BlockDPA(nn.Module):
        @nn.compact
        def __call__(self, x):
            b, s, w = x.shape
            y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16)(x)
            qkv = nn.Dense(3 * w, dtype=jnp.bfloat16)(y)
            q, k, vv = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(b, s, H, DH)
            k = k.reshape(b, s, H, DH)
            vv = vv.reshape(b, s, H, DH)
            o = jax.nn.dot_product_attention(q, k, vv)
            x = x + nn.Dense(w, dtype=jnp.bfloat16)(o.reshape(b, s, w))
            y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16)(x)
            y = nn.Dense(4 * w, dtype=jnp.bfloat16)(y)
            y = y * jax.nn.sigmoid(1.702 * y)
            return x + nn.Dense(w, dtype=jnp.bfloat16)(y)

    class TrunkDPA(nn.Module):
        @nn.compact
        def __call__(self, x):
            for _ in range(L):
                x = BlockDPA()(x)
            return x

    for B in (128, 256):
        xt = jnp.asarray(g.standard_normal((B, S, W)), jnp.bfloat16)
        m2 = TrunkDPA()
        v2 = m2.init(jax.random.PRNGKey(0), xt)
        v2 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, v2)
        f2 = jax.jit(lambda v_, x_: m2.apply(v_, x_))
        t = timeit(f2, v2, xt)
        fl = B * flops_per_image_trunk()
        print(f"E. dpa-trunk B={B}: {fl/t/1e12:.1f} TF/s  ({t*1e3:.2f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
