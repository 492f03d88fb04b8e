"""Train-step roofline breakdown (real TPU) — VERDICT r2 item 6.

Splits the bf16 full train step (B=256, ViT-B-16) into measured regions
by timing nested sub-programs and differencing:

  A. full jitted train step (the r2 1,386 samples/s program)
  B. frozen-tower region: 2× encode_image + encode_text (fwd only)
  C. fusion fwd only (train_features, loss, no grad)
  D. fusion fwd+bwd (value_and_grad wrt ern params; towers are frozen
     so no tower backward exists)
  E. optimizer update alone (adam on ern params)

Step ≈ B + (D−C share) + C + E; the residual vs A is measurement +
scheduling overlap. Sync: host readback, best-of-3.
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
from fashionern_aaai2024_tpu.train.step import build_train_step

B = 256


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])


def timeit(fn, *args, iters=5, windows=3):
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
    print("devices:", jax.devices(), flush=True)
    g = np.random.default_rng(0)
    cfg = get_clip_config("ViT-B-16", activation="quick_gelu")
    model = ComposedCIRModel(cfg, patch_num=13)
    v = cfg.vision
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        np.zeros((2, v.image_size, v.image_size, 3), np.float32),
        np.zeros((2, v.image_size, v.image_size, 3), np.float32),
        np.zeros((2, cfg.text.context_length), np.int32),
        np.zeros((2, 13, cfg.feature_dim), np.float32),
        np.zeros((2, 13, cfg.feature_dim), np.float32),
        deterministic=False, method=model.train_forward,
    )
    opt = optax.adam(1e-4)
    state = cast_frozen_clip_bf16(create_train_state(variables, opt, rng))

    batch = {
        "ref_image": jnp.asarray(
            g.random((B, v.image_size, v.image_size, 3), dtype=np.float32),
            jnp.bfloat16),
        "tar_image": jnp.asarray(
            g.random((B, v.image_size, v.image_size, 3), dtype=np.float32),
            jnp.bfloat16),
        "text_ids": jnp.asarray(
            g.integers(0, 40000, (B, cfg.text.context_length)), jnp.int32),
        "ref_patch": jnp.asarray(
            g.standard_normal((B, 13, cfg.feature_dim)), jnp.float32),
        "tar_patch": jnp.asarray(
            g.standard_normal((B, 13, cfg.feature_dim)), jnp.float32),
    }

    # A. full step
    step = build_train_step(model, opt, donate=False)
    t_a = timeit(lambda s, b: step(s, b)[1], state, batch)
    print(f"A. full train step: {t_a*1e3:.1f} ms  ({B/t_a:.0f} samples/s)",
          flush=True)

    variables_b = state.variables()

    # B. tower region (fwd only)
    @jax.jit
    def towers(vv, b):
        rg, _ = model.apply(vv, b["ref_image"], method=model.encode_image)
        tg_, _ = model.apply(vv, b["tar_image"], method=model.encode_image)
        txg, txs = model.apply(vv, b["text_ids"], method=model.encode_text)
        return rg, tg_, txg, txs

    t_b = timeit(towers, variables_b, batch)
    print(f"B. frozen towers fwd (2 img + text): {t_b*1e3:.1f} ms", flush=True)

    feats = jax.tree_util.tree_map(lambda x: x, towers(variables_b, batch))
    rg, tgl, txg, txs = feats

    def fusion_loss(ern_params, rng_):
        from fashionern_aaai2024_tpu.ops.losses import (
            batch_based_classification_loss,
        )

        vv = {"params": {"clip": state.clip_params, "ern": ern_params}}
        if state.batch_stats:
            vv["batch_stats"] = state.batch_stats
        (fusion, target), _ = model.apply(
            vv, rg.astype(jnp.float32), batch["ref_patch"],
            txg.astype(jnp.float32), txs.astype(jnp.float32),
            tgl.astype(jnp.float32)
            / jnp.linalg.norm(tgl.astype(jnp.float32), axis=-1, keepdims=True),
            batch["tar_patch"],
            deterministic=False, method=model.train_features,
            mutable=["batch_stats"], rngs={"dropout": rng_},
        )
        return batch_based_classification_loss(fusion, target)

    rngk = jax.random.PRNGKey(3)
    # C. fusion fwd only
    c_fn = jax.jit(fusion_loss)
    t_c = timeit(c_fn, state.ern_params, rngk)
    print(f"C. fusion fwd+loss: {t_c*1e3:.1f} ms", flush=True)

    # D. fusion fwd+bwd
    d_fn = jax.jit(jax.value_and_grad(fusion_loss))
    t_d = timeit(lambda p, r: d_fn(p, r)[0], state.ern_params, rngk)
    print(f"D. fusion fwd+bwd: {t_d*1e3:.1f} ms", flush=True)

    # E. optimizer alone
    grads = d_fn(state.ern_params, rngk)[1]
    opt_state = opt.init(state.ern_params)

    @jax.jit
    def apply_opt(gr, os_, p):
        up, os2 = opt.update(gr, os_, p)
        return optax.apply_updates(p, up)

    t_e = timeit(apply_opt, grads, opt_state, state.ern_params)
    print(f"E. adam update: {t_e*1e3:.2f} ms", flush=True)

    print(f"sum B+D+E = {(t_b+t_d+t_e)*1e3:.1f} ms vs A {t_a*1e3:.1f} ms "
          f"(residual = overlap/step glue)", flush=True)
    print(f"tower share of step: {t_b/t_a*100:.0f}%", flush=True)


if __name__ == "__main__":
    main()
