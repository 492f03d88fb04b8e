"""Headline benchmark: gallery images/sec embedded (ViT-B-16, 1 chip).

This is the hot loop of the reference's eval path —
`extract_index_features` (`/root/reference/utils/utils.py:44-99`)
encoding the full retrieval gallery — plus the index-tower refinement
(`mode="index"`) fused into the same program, measured end-to-end as
images/sec on a single chip.

Baseline: the reference publishes no throughput numbers
(BASELINE.json `published = {}`). `vs_baseline` is computed against a
documented estimate of the reference setup's per-GPU gallery embed
rate: torch fp16 CLIP ViT-B/16 inference on a V100 at batch 32 as the
reference runs it ≈ 500 images/sec/GPU. The ≥5× north-star in
BASELINE.json refers to this figure; see BASELINE.md "Provenance of the
500 img/s V100 denominator" for the derivation (fp32 reality ~300 img/s,
fp16 upper bound ~950 — 500 is deliberately generous to the reference).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

V100_BASELINE_IMGS_PER_SEC = 500.0
BATCH = 128
ITERS = 20


def main() -> None:
    from fashionern_aaai2024_tpu.models.clip.config import get_clip_config
    from fashionern_aaai2024_tpu.models.composed import ComposedCIRModel

    # quick_gelu is the OpenAI-checkpoint activation (the production
    # configuration when loading published CLIP weights) and is also
    # measurably faster than exact erf-GELU on the VPU (~18% of trunk)
    cfg = get_clip_config("ViT-B-16", activation="quick_gelu")
    model = ComposedCIRModel(cfg, patch_num=13)

    rng = jax.random.PRNGKey(0)
    v = cfg.vision
    init_batch = 2
    variables = model.init(
        {"params": rng, "dropout": rng},
        np.zeros((init_batch, v.image_size, v.image_size, 3), np.float32),
        np.zeros((init_batch, v.image_size, v.image_size, 3), np.float32),
        np.zeros((init_batch, cfg.text.context_length), np.int32),
        np.zeros((init_batch, 13, cfg.feature_dim), np.float32),
        np.zeros((init_batch, 13, cfg.feature_dim), np.float32),
        deterministic=False,
        method=model.train_forward,
    )
    # bf16 weights: TPU MXU-native; retrieval similarity stays fp32 at
    # search time (ops.similarity accumulates fp32)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, variables
    )

    @jax.jit
    def embed_and_refine(variables, images, patches):
        g, _ = model.apply(variables, images, method=model.encode_image)
        g = g.astype(jnp.float32)
        g = g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-12)
        return model.apply(variables, g, patches, method=model.index)

    g = np.random.default_rng(0)
    images = jnp.asarray(
        g.random((BATCH, v.image_size, v.image_size, 3), dtype=np.float32),
        dtype=jnp.bfloat16,
    )
    patches = jnp.asarray(
        g.standard_normal((BATCH, 13, cfg.feature_dim)), dtype=jnp.bfloat16
    )

    # NB: sync via host readback, not block_until_ready — through the
    # axon TPU tunnel block_until_ready returns before device execution
    # completes (measured: it reported 65 PFLOP/s on an 8192³ matmul).
    def sync(x):
        return np.asarray(x[:1, :1])

    sync(embed_and_refine(variables, images, patches))  # compile + warmup
    sync(embed_and_refine(variables, images, patches))

    # best of 3 windows — the shared chip shows ±15% run-to-run noise
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = embed_and_refine(variables, images, patches)
        sync(out)
        best = min(best, time.perf_counter() - t0)

    imgs_per_sec = BATCH * ITERS / best
    print(json.dumps({
        "metric": "gallery_images_per_sec_embedded_vit_b16_1chip",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / V100_BASELINE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    # the axon tunnel / remote compile service has outages measured in
    # minutes (r3: one ~2h window); retry with growing backoff so a
    # transient outage at bench time doesn't record a failed round
    for attempt, delay in enumerate((20, 60, 180, 420)):
        try:
            main()
            break
        except Exception:  # transient tunnel/compile-service failures
            import sys
            import traceback

            traceback.print_exc()
            print(f"bench attempt {attempt + 1} failed; retrying in "
                  f"{delay}s", file=sys.stderr, flush=True)
            time.sleep(delay)
    else:
        main()  # final attempt propagates its error
