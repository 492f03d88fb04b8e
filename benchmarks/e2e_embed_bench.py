"""End-to-end gallery embedding from a real JPEG directory.

The headline bench (bench.py) measures chip compute on device-resident
images; this bench measures what a USER sees embedding a directory:
native JPEG decode → Loader → per-batch H2D upload → encode+refine on
the chip, with embed_gallery's dispatch-ahead overlap. Rows: f32 feed
vs the uint8 feed (`--image-dtype uint8` equivalent).

Run on the chip host:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/e2e_embed_bench.py [n]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np


class DirDataset:
    """Classic-mode items from a flat JPEG dir (production decode path)."""

    def __init__(self, root: str, n: int, dim: int, as_uint8: bool):
        self.root, self.n, self.dim, self.as_uint8 = root, n, dim, as_uint8

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        from fashionern_aaai2024_tpu.data.transforms import load_and_preprocess

        img = load_and_preprocess(
            os.path.join(self.root, f"img{i}.jpg"), self.dim, "target", 1.25,
            as_uint8=self.as_uint8)
        return {"name": f"img{i}", "image": img}


def main():
    import jax

    from fashionern_aaai2024_tpu.data.loader import Loader
    from fashionern_aaai2024_tpu.models.clip.config import get_clip_config
    from fashionern_aaai2024_tpu.models.composed import ComposedCIRModel
    from fashionern_aaai2024_tpu.retrieval.engine import embed_gallery
    from PIL import Image

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    batch = 128
    cfg = get_clip_config("ViT-B-16", activation="quick_gelu")
    size = cfg.input_dim
    print("devices:", jax.devices())

    import jax.numpy as jnp

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
    def encode(images):
        g, tok = model.apply(variables, images, method=model.encode_image)
        return g, tok

    with tempfile.TemporaryDirectory() as root:
        rng = np.random.default_rng(0)
        for i in range(n):
            arr = rng.integers(0, 256, (360, 300, 3), dtype=np.uint8)
            Image.fromarray(arr).save(
                os.path.join(root, f"img{i}.jpg"), quality=90)

        for as_u8 in (False, True):
            ds = DirDataset(root, n, size, as_u8)
            loader = Loader(ds, batch, num_workers=0, worker_type="thread")
            # warm compile at exactly the padded batch shape
            # embed_gallery dispatches (pad, don't truncate: n < batch
            # would otherwise recompile inside the timed loop)
            from fashionern_aaai2024_tpu.retrieval.engine import _pad_rows

            first = next(iter(loader))
            np.asarray(encode(_pad_rows(first["image"], batch))[0][:1])
            rows = {}
            for depth in (0, 2):  # serial feed vs device prefetch A/B
                t0 = time.perf_counter()
                feats = embed_gallery(encode, loader, batch, prefetch=depth)
                dt = time.perf_counter() - t0
                rows[depth] = n / dt
                label = "uint8" if as_u8 else "f32  "
                mode = f"prefetch={depth}"
                print(f"{label} feed {mode}: {n / dt:7.1f} img/s "
                      f"end-to-end ({dt:.1f} s for {n}; "
                      f"feats {feats.features.shape})", flush=True)
            print(f"  overlap win: {rows[2] / rows[0]:.2f}x "
                  f"(ceiling = min(decode, H2D, compute) once overlapped)")


if __name__ == "__main__":
    main()
