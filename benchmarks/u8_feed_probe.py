"""uint8 image-feed probe: host→device transfer + embed throughput.

The headline bench feeds device-resident images, so it never pays H2D.
Real gallery embedding uploads every batch; this probe measures what
the u8 feed (raw pixels + on-device normalize, 4× fewer bytes) is
worth on the real path:

  1. pure H2D: device_put of [B, 224, 224, 3] float32 vs uint8
  2. embed+refine with per-batch upload: f32 feed vs u8 feed
  3. feature agreement between the two feeds

Run on the chip: PYTHONPATH=/root/repo:/root/.axon_site python
benchmarks/u8_feed_probe.py  (do NOT set JAX_PLATFORMS).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 128
REPS = 30


def median_ms(fn, reps=REPS):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        # host readback is the sync point through the axon tunnel
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    from fashionern_aaai2024_tpu.models.clip.config import get_clip_config
    from fashionern_aaai2024_tpu.models.composed import ComposedCIRModel
    from fashionern_aaai2024_tpu import native

    print("devices:", jax.devices())
    cfg0 = get_clip_config("ViT-B-16")
    size = cfg0.input_dim
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (BATCH, size, size, 3), dtype=np.uint8)
    f32 = native.normalize_images(u8)

    # --- 1. pure H2D -------------------------------------------------------
    dev = jax.devices()[0]
    put_f32 = median_ms(lambda: jax.device_put(f32, dev))
    put_u8 = median_ms(lambda: jax.device_put(u8, dev))
    mb_f32 = f32.nbytes / 1e6
    mb_u8 = u8.nbytes / 1e6
    print(f"H2D f32 [{BATCH},{size},{size},3] ({mb_f32:.0f} MB): "
          f"{put_f32:.1f} ms ({mb_f32 / put_f32:.2f} GB/s)")
    print(f"H2D u8  ({mb_u8:.0f} MB): {put_u8:.1f} ms "
          f"({mb_u8 / put_u8:.2f} GB/s)  -> {put_f32 / put_u8:.2f}x faster")

    # --- 2. embed+refine with per-batch upload -----------------------------
    cfg = get_clip_config("ViT-B-16", activation="quick_gelu")
    model = ComposedCIRModel(cfg, patch_num=13)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        np.zeros((2, size, size, 3), np.float32),
        np.zeros((2, size, size, 3), np.float32),
        np.zeros((2, cfg.text.context_length), np.int32),
        np.zeros((2, 13, cfg.feature_dim), np.float32),
        np.zeros((2, 13, cfg.feature_dim), np.float32),
        deterministic=False, method=model.train_forward,
    )
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)

    @jax.jit
    def embed(v, images):
        g, _ = model.apply(v, images, method=model.encode_image)
        return g

    def run(feed):
        return embed(variables, feed)

    ms_f32 = median_ms(lambda: run(f32))
    ms_u8 = median_ms(lambda: run(u8))
    print(f"embed w/ upload, f32 feed: {ms_f32:.1f} ms "
          f"({BATCH / ms_f32 * 1e3:.0f} img/s)")
    print(f"embed w/ upload, u8  feed: {ms_u8:.1f} ms "
          f"({BATCH / ms_u8 * 1e3:.0f} img/s)  "
          f"-> {ms_f32 / ms_u8:.2f}x")

    # --- 3. agreement -------------------------------------------------------
    a = np.asarray(embed(variables, f32), np.float32)
    b = np.asarray(embed(variables, u8), np.float32)
    denom = max(1e-9, float(np.abs(a).max()))
    print(f"feature max rel diff u8 vs f32 feed: "
          f"{float(np.abs(a - b).max()) / denom:.2e}")


if __name__ == "__main__":
    main()
