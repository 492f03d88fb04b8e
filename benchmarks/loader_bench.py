"""Data-pipeline throughput: thread vs process (fork) loader workers on
real JPEG decode (VERDICT round 1, weak #6).

Builds a synthetic dataset of real on-disk JPEGs at reference geometry
(360-ish source -> 224 targetpad preprocess, 13-patch .npy loads), then
measures loader samples/sec for worker_type x num_workers, and compares
against the train-step consumption rate recorded in BASELINE.md.

Run: PYTHONPATH=/root/repo python benchmarks/loader_bench.py [n_images]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np


def build_dataset(root: str, n: int) -> None:
    from PIL import Image

    g = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "patches"), exist_ok=True)
    for i in range(n):
        arr = g.integers(0, 256, (360, 300, 3), dtype=np.uint8)
        Image.fromarray(arr).save(
            os.path.join(root, "images", f"img{i}.jpg"), quality=90)
        np.save(os.path.join(root, "patches", f"img{i}.npy"),
                g.standard_normal((13, 512)).astype(np.float32))


class JpegDataset:
    """Reference-shaped item: targetpad-preprocessed image + patch feats."""

    def __init__(self, root: str, n: int, as_uint8: bool = False):
        self.root, self.n = root, n
        self.as_uint8 = as_uint8

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        # production path: native C decode for JPEG, PIL otherwise
        from fashionern_aaai2024_tpu.data.transforms import load_and_preprocess

        img = load_and_preprocess(
            os.path.join(self.root, "images", f"img{i}.jpg"), 224, "target",
            1.25, as_uint8=self.as_uint8)
        patch = np.load(os.path.join(self.root, "patches", f"img{i}.npy"))
        return {"image": img, "patch": patch, "name": f"img{i}"}


def measure(loader) -> float:
    n = 0
    t0 = time.perf_counter()
    for batch in loader:
        n += len(batch["name"])
    return n / (time.perf_counter() - t0)


def main():
    from fashionern_aaai2024_tpu.data.loader import Loader

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    with tempfile.TemporaryDirectory() as root:
        build_dataset(root, n)
        ds = JpegDataset(root, n)
        print(f"host cpus: {os.cpu_count()}, images: {n}, batch 128")
        for wt, nw in (("thread", 0), ("thread", 4), ("thread", 8),
                       ("process", 4), ("process", 8)):
            loader = Loader(ds, 128, num_workers=nw, worker_type=wt)
            measure(loader)  # warm page cache
            rate = measure(loader)
            print(f"{wt:8s} workers={nw}: {rate:8.1f} samples/sec")
        # u8 feed: raw-pixel items (normalize happens on device) — 4x
        # smaller items through decode/collate
        loader = Loader(JpegDataset(root, n, as_uint8=True), 128,
                        num_workers=0, worker_type="thread")
        measure(loader)
        print(f"thread   workers=0 (uint8 feed): {measure(loader):8.1f} samples/sec")


if __name__ == "__main__":
    main()
