"""End-to-end embed ms-budget / MFU audit (VERDICT r4 #6).

One table per backbone at B=128: per-region ms summing (with an explicit
residual) to the measured full embed+refine batch time, reconciling the
trunk-level TF/s (~73% of the GEMM-chain roofline, trunk_probe) with the
end-to-end headline (~36%):

  regions (ViT-B-16): patch-embed conv | trunk (12 blocks) | head
      (ln_post+proj) | refine/index tower | fusion residual |
      per-dispatch gap (solo-sync vs pipelined)
  regions (RN50x4):   encode_image (stem+4 stages+attnpool — intra-split
      owned by rn_stage_probe) | refine tower | residual | dispatch gap

All programs jitted separately and timed with host-readback sync
(best-of-3 windows); `full pipelined` is bench.py's exact measurement
protocol (20 dispatches, one sync), `full solo` syncs every call — the
difference is the per-dispatch tunnel/host gap the pipelined headline
amortizes.

Run (on-chip):
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/embed_budget_probe.py
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/fashionern/jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import jax
import jax.numpy as jnp
import numpy as np

from fashionern_aaai2024_tpu.models.clip.config import get_clip_config
from fashionern_aaai2024_tpu.models.composed import ComposedCIRModel

# overridable for cheap CPU smoke runs; the audited numbers use defaults
B = int(os.environ.get("BUDGET_B", "128"))
ITERS = int(os.environ.get("BUDGET_ITERS", "20"))
PEAK_TFS = 197.0  # v5e bf16


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0][..., :1])


def timeit(fn, *args, iters=ITERS, windows=3, per_call_sync=False):
    sync(fn(*args))
    sync(fn(*args))
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            if per_call_sync:
                sync(out)
        if not per_call_sync:
            sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def vit_flops(cfg):
    v = cfg.vision
    grid = v.image_size // v.patch_size
    S, W, L = grid * grid + 1, v.width, v.layers
    patch = 2 * (grid * grid) * W * (v.patch_size ** 2 * 3)
    trunk = L * (2 * S * W * W * (3 + 1 + 8) + 4 * S * S * W)
    head = 2 * S * W * cfg.feature_dim
    return patch, trunk, head


def build(model_name):
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
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)
    return cfg, model, variables


def audit(model_name):
    cfg, model, variables = build(model_name)
    v = cfg.vision
    g = np.random.default_rng(0)
    images = jnp.asarray(g.random((B, v.image_size, v.image_size, 3),
                                  dtype=np.float32), jnp.bfloat16)
    patches = jnp.asarray(g.standard_normal((B, 13, cfg.feature_dim)),
                          jnp.bfloat16)

    @jax.jit
    def full(variables, images, patches):
        gl, _ = model.apply(variables, images, method=model.encode_image)
        gl = gl.astype(jnp.float32)
        gl = gl / (jnp.linalg.norm(gl, axis=-1, keepdims=True) + 1e-12)
        return model.apply(variables, gl, patches, method=model.index)

    @jax.jit
    def encode(variables, images):
        return model.apply(variables, images, method=model.encode_image)[0]

    feats = np.asarray(encode(variables, images), np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True) + 1e-12
    feats_d = jnp.asarray(feats, jnp.float32)

    @jax.jit
    def refine(variables, f, p):
        return model.apply(variables, f, p, method=model.index)

    rows = {}
    rows["full pipelined (headline protocol)"] = timeit(full, variables, images, patches)
    rows["full solo-sync"] = timeit(full, variables, images, patches,
                                    per_call_sync=True, iters=5)
    rows["encode_image"] = timeit(encode, variables, images)
    rows["refine/index tower"] = timeit(refine, variables, feats_d, patches)

    is_vit = model_name.startswith("ViT")
    if is_vit:
        grid = v.image_size // v.patch_size
        S, W = grid * grid + 1, v.width
        kern = jnp.asarray(
            g.standard_normal((v.patch_size, v.patch_size, 3, W)) * 0.02,
            jnp.bfloat16)
        pe = jnp.asarray(g.standard_normal((S, W)) * 0.02, jnp.bfloat16)

        @jax.jit
        def patch_embed(imgs):
            x = jax.lax.conv_general_dilated(
                imgs, kern, (v.patch_size, v.patch_size), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = x.reshape(B, grid * grid, W)
            x = jnp.concatenate(
                [jnp.zeros((B, 1, W), x.dtype), x], axis=1) + pe[None]
            return x

        from fashionern_aaai2024_tpu.models.clip.transformer import Transformer

        import flax.linen as nn

        class TrunkOnly(nn.Module):
            @nn.compact
            def __call__(self, x):
                return Transformer(W, v.layers, v.heads, "quick_gelu",
                                   name="transformer")(x)

        tk = TrunkOnly()
        x0 = jnp.asarray(g.standard_normal((B, S, W)), jnp.bfloat16)
        tvars = tk.init(jax.random.PRNGKey(1), x0)
        tvars = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            tvars)
        trunk_fn = jax.jit(lambda vv, x: tk.apply(vv, x))
        proj = jnp.asarray(g.standard_normal((W, cfg.feature_dim)) * 0.02,
                           jnp.bfloat16)
        gam = jnp.ones((W,), jnp.bfloat16)

        @jax.jit
        def head(x):
            mu = x.mean(-1, keepdims=True)
            var = ((x - mu) ** 2).mean(-1, keepdims=True)
            return (((x - mu) * jax.lax.rsqrt(var + 1e-5)) * gam) @ proj

        rows["  patch-embed conv"] = timeit(patch_embed, images)
        rows["  trunk (12 blocks)"] = timeit(trunk_fn, tvars, x0)
        rows["  head (ln_post+proj)"] = timeit(head, trunk_fn(tvars, x0))

    print(f"\n== {model_name} @ B={B} (ms per batch, bf16) ==")
    full_t = rows["full pipelined (headline protocol)"]
    for k, t in rows.items():
        print(f"  {k:42s} {t*1e3:8.2f} ms  ({B/t:7.0f} img/s)")
    gap = rows["full solo-sync"] - full_t
    parts = rows["encode_image"] + rows["refine/index tower"]
    print(f"  {'per-dispatch gap (solo − pipelined)':42s} {gap*1e3:8.2f} ms")
    print(f"  {'residual: full − (encode + refine)':42s} "
          f"{(full_t - parts)*1e3:8.2f} ms  (XLA fusion across regions)")
    if is_vit:
        inner = (rows["  patch-embed conv"] + rows["  trunk (12 blocks)"]
                 + rows["  head (ln_post+proj)"])
        print(f"  {'encode glue: encode − (patch+trunk+head)':42s} "
              f"{(rows['encode_image'] - inner)*1e3:8.2f} ms")
        pf, tf, hf = vit_flops(cfg)
        for label, fl, t in (("patch-embed", pf, rows["  patch-embed conv"]),
                             ("trunk", tf, rows["  trunk (12 blocks)"]),
                             ("head", hf, rows["  head (ln_post+proj)"])):
            tfs = fl * B / t / 1e12
            print(f"    {label:14s} {fl*B/1e9:8.1f} GF  →{tfs:7.1f} TF/s "
                  f"({tfs/PEAK_TFS*100:4.1f}% of 197)")
        total_fl = (pf + tf + hf) * B
        tfs = total_fl / full_t / 1e12
        print(f"    end-to-end (towers only) {total_fl/1e9:.1f} GF → "
              f"{tfs:.1f} TF/s ({tfs/PEAK_TFS*100:.1f}% of 197; refine "
              f"tower FLOPs excluded from numerator)")
    return rows


def main():
    print("devices:", jax.devices(), flush=True)
    for m in ("ViT-B-16", "RN50x4"):
        audit(m)


if __name__ == "__main__":
    main()
