"""Host data-pipeline throughput: PIL decode + TargetPad preprocessing
+ patch-pack gather through the Loader, as the trainer consumes it.

The reference's pipeline is per-item `torch.load` of patch `.pth`s +
PIL decode in 4 DataLoader worker processes (SURVEY §7 hard part #5);
ours is a thread-pool Loader (per-ITEM futures) over an mmap pack with
the native gather.

NB: this dev environment exposes a single CPU core (`nproc`=1), so no
worker count can show scaling here — PIL decode measured 0.9-1.0×
across thread counts regardless of code structure. Real TPU-VM hosts
have 100+ vCPUs; the per-item futures design scales with them.

Prints one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np
from PIL import Image


def build_tree(root: str, n_images: int, dim: int, feat_dim: int) -> None:
    from fashionern_aaai2024_tpu.data.patch_store import PatchFeatureStore

    g = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    names = []
    for i in range(n_images):
        img = (g.random((dim * 2, int(dim * 1.5), 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, "images", f"im{i}.jpg"),
                                  quality=90)
        names.append(f"im{i}")
    feats = g.standard_normal((n_images, 13, feat_dim)).astype(np.float32)
    PatchFeatureStore.write_pack(os.path.join(root, "patches"), names, feats)


class SyntheticTrainDataset:
    """FashionIQ-shaped items over the synthetic tree."""

    def __init__(self, root: str, n: int, dim: int):
        from fashionern_aaai2024_tpu.data.patch_store import PatchFeatureStore
        from fashionern_aaai2024_tpu.data.transforms import preprocess_image

        self.root = root
        self.n = n
        self.dim = dim
        self.patches = PatchFeatureStore(os.path.join(root, "patches"))
        self._pre = preprocess_image

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        name = f"im{i % self.n}"
        with Image.open(os.path.join(self.root, "images", f"{name}.jpg")) as im:
            ref = self._pre(im, self.dim)
        with Image.open(os.path.join(self.root, "images",
                                     f"im{(i + 1) % self.n}.jpg")) as im:
            tar = self._pre(im, self.dim)
        return {
            "ref_image": ref, "tar_image": tar,
            "captions": ["is red", "has sleeves"],
            "ref_patch": self.patches.get(name),
            "tar_patch": self.patches.get(f"im{(i + 1) % self.n}"),
        }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-images", default=256, type=int)
    p.add_argument("--dim", default=224, type=int)
    p.add_argument("--feat-dim", default=512, type=int)
    p.add_argument("--batch-size", default=64, type=int)
    args = p.parse_args()

    from fashionern_aaai2024_tpu.data.loader import Loader

    with tempfile.TemporaryDirectory() as root:
        build_tree(root, args.n_images, args.dim, args.feat_dim)
        ds = SyntheticTrainDataset(root, args.n_images, args.dim)
        for workers in (0, 4, 8):
            loader = Loader(ds, args.batch_size, num_workers=workers)
            next(iter(loader))  # warm page cache
            t0 = time.perf_counter()
            total = 0
            for batch in loader:
                total += len(batch["captions"])
            dt = time.perf_counter() - t0
            print(json.dumps({
                "metric": f"host_pipeline_samples_per_sec_workers{workers}",
                "value": round(total / dt, 2),
                "unit": "samples/sec (2 decodes + 2 patch gathers each)",
                "batch": args.batch_size,
            }))


if __name__ == "__main__":
    main()
