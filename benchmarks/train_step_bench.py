"""Train-step throughput on the real chip (VERDICT r1 #8).

donate=False throughout: the benchmark reuses the init variables tree
across precision configs, and donation would delete those buffers.

Measures samples/sec for the full ViT-B-16 training step (two frozen
image towers + text tower + ERN fusion + grouped BBC loss + Adam) and
for the cached-feature step (`--cache-features`: image towers replaced
by feature lookups, text online), fp32 and bf16.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/train_step_bench.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fashionern_aaai2024_tpu.models.clip.config import get_clip_config
from fashionern_aaai2024_tpu.models.composed import ComposedCIRModel
from fashionern_aaai2024_tpu.train.state import (
    cast_frozen_clip_bf16, create_train_state,
)
from fashionern_aaai2024_tpu.train.step import (
    build_cached_image_train_step, build_train_step,
)

B = 256


def sync(x):
    return float(x)  # loss scalar readback = sync point


def timeit(step, state, batch, iters=8):
    state, loss = step(state, batch)
    sync(loss)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, loss = step(state, batch)
        sync(loss)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, state


def main():
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
    optimizer = optax.adam(1e-4)
    g = np.random.default_rng(0)

    def image_batch(dtype):
        return {
            "ref_image": jnp.asarray(
                g.random((B, v.image_size, v.image_size, 3), np.float32), dtype),
            "tar_image": jnp.asarray(
                g.random((B, v.image_size, v.image_size, 3), np.float32), dtype),
            "text_ids": jnp.asarray(
                g.integers(0, 49000, (B, 77)).astype(np.int32)),
            "ref_patch": jnp.asarray(
                g.standard_normal((B, 13, cfg.feature_dim)), jnp.float32),
            "tar_patch": jnp.asarray(
                g.standard_normal((B, 13, cfg.feature_dim)), jnp.float32),
        }

    for precision in ("fp32", "bf16"):
        state = create_train_state(variables, optimizer, jax.random.PRNGKey(1))
        if precision == "bf16":
            state = cast_frozen_clip_bf16(state)
        step = build_train_step(model, optimizer, negatives="local",
                                local_groups=1, donate=False)
        batch = image_batch(jnp.bfloat16 if precision == "bf16" else jnp.float32)
        t, state = timeit(step, state, batch)
        print(f"full train step {precision} B={B}: {B/t:.0f} samples/sec "
              f"({t*1e3:.1f} ms/step)", flush=True)

    # quantized-tower full step (`train --quantize-towers`): int8 MLP
    # kernels in the frozen towers; bf16 everywhere else. The fallback
    # for image sets that outrun --cache-features — the step is ~80%
    # tower forward (r3 roofline) so the eval-side int8 win transfers.
    q_model = ComposedCIRModel(
        get_clip_config("ViT-B-16", activation="quick_gelu",
                        quantize_mlp=True), patch_num=13)
    state = create_train_state(variables, optimizer, jax.random.PRNGKey(1))
    state = cast_frozen_clip_bf16(state)
    step = build_train_step(q_model, optimizer, negatives="local",
                            local_groups=1, donate=False)
    t, state = timeit(step, state, image_batch(jnp.bfloat16))
    print(f"full train step bf16+int8 towers B={B}: {B/t:.0f} samples/sec "
          f"({t*1e3:.1f} ms/step)", flush=True)

    # cached-feature step: image towers out of the graph
    for precision in ("fp32", "bf16"):
        state = create_train_state(variables, optimizer, jax.random.PRNGKey(1))
        if precision == "bf16":
            state = cast_frozen_clip_bf16(state)
        step = build_cached_image_train_step(model, optimizer,
                                             negatives="local", local_groups=1,
                                             donate=False)
        batch = {
            "ref_feats": jnp.asarray(
                g.standard_normal((B, cfg.feature_dim)), jnp.float32),
            "tar_feats": jnp.asarray(
                g.standard_normal((B, cfg.feature_dim)), jnp.float32),
            "text_ids": jnp.asarray(
                g.integers(0, 49000, (B, 77)).astype(np.int32)),
            "ref_patch": jnp.asarray(
                g.standard_normal((B, 13, cfg.feature_dim)), jnp.float32),
            "tar_patch": jnp.asarray(
                g.standard_normal((B, 13, cfg.feature_dim)), jnp.float32),
        }
        t, state = timeit(step, state, batch)
        print(f"cached-feature step {precision} B={B}: {B/t:.0f} samples/sec "
              f"({t*1e3:.1f} ms/step)", flush=True)

    # cached + int8: the image towers are cache lookups, so the only
    # tower left online is the TEXT encoder — the int8 sub-block
    # kernels dispatch there too (dh=64, width 512 % 128 == 0)
    state = create_train_state(variables, optimizer, jax.random.PRNGKey(1))
    state = cast_frozen_clip_bf16(state)
    step = build_cached_image_train_step(q_model, optimizer,
                                         negatives="local", local_groups=1,
                                         donate=False)
    t, state = timeit(step, state, batch)
    print(f"cached-feature step bf16+int8 text B={B}: {B/t:.0f} samples/sec "
          f"({t*1e3:.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
