"""Offline 13-crop patch-feature extraction, batched for TPU.

Reference (`utils/extract_patch_features_200k.py`,
`utils/extract_fashioniq_patch.py`): resize the image to 360×360, cut a
2×2 grid (4 crops) + 3×3 grid (9 crops), preprocess each crop with the
TargetPad pipeline, encode each crop **one at a time** with a
fine-tuned CLIP, `torch.save` a `[13, dim]` tensor per image.

Here the 13 crops become a batch axis: B images → one `[B·13, d, d, 3]`
device array → a single jit CLIP forward → `[B, 13, dim]`. Output is
`.npy` per image plus an optional consolidated memory-mapped pack
(`pack.npy` + `pack.names.json`) that `data.patch_store` reads with
zero per-item file opens. The resume-from-`dir.txt` / shard-by-`i%3`
hacks (`extract_patch_features_200k.py:141-154`) are replaced by
skip-if-output-exists.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Sequence

import numpy as np
from PIL import Image

from fashionern_aaai2024_tpu.data.transforms import preprocess_image

RESIZE = 360
GRIDS = (2, 3)  # 4 + 9 = 13 crops


def cut_crops(image: Image.Image, grids: Sequence[int] = GRIDS) -> list[Image.Image]:
    """Integer-divided grid crops, reference geometry
    (`extract_patch_features_200k.py:25-51`)."""
    crops: list[Image.Image] = []
    w, h = image.size
    for g in grids:
        iw, ih = int(w / g), int(h / g)
        for i in range(g):
            for j in range(g):
                crops.append(image.crop((j * iw, i * ih, (j + 1) * iw, (i + 1) * ih)))
    return crops


def image_to_crop_array(
    path_or_image, dim: int, target_ratio: float = 1.25
) -> np.ndarray:
    """One image → [13, dim, dim, 3] preprocessed crops.

    JPEG paths take the fused native pipeline (decode + board resize +
    13 windowed resizes + normalize in one C call, bit-identical —
    crops are square, so TargetPad is a no-op whenever
    target_ratio > 1.0); anything else falls back to PIL."""
    if isinstance(path_or_image, (str, os.PathLike)):
        with open(path_or_image, "rb") as f:
            data = f.read()
        if target_ratio > 1.0:
            from fashionern_aaai2024_tpu.native import image as native_image

            if native_image.is_jpeg(data):
                out = native_image.extract_crops(data, dim, RESIZE)
                if out is not None:
                    return out
        import io

        with Image.open(io.BytesIO(data)) as img:
            image = img.convert("RGB").resize((RESIZE, RESIZE), Image.BICUBIC)
    else:
        image = path_or_image.convert("RGB").resize((RESIZE, RESIZE), Image.BICUBIC)
    crops = cut_crops(image)
    return np.stack([
        preprocess_image(c, dim, "target", target_ratio) for c in crops
    ])


class PatchExtractor:
    """`encode_fn`: jitted [N, d, d, 3] → [N, feat] (global CLIP image
    embedding); `batch_images` images are encoded per device call."""

    def __init__(self, encode_fn: Callable, dim: int, batch_images: int = 16,
                 target_ratio: float = 1.25):
        self.encode_fn = encode_fn
        self.dim = dim
        self.batch_images = batch_images
        self.target_ratio = target_ratio
        self.n_crops = sum(g * g for g in GRIDS)

    def extract_batch(self, paths: Sequence) -> np.ndarray:
        """[B, 13, feat] for B ≤ batch_images paths. Host crop prep is
        threaded so decode overlaps the previous batch's device work."""
        import concurrent.futures as futures

        b = len(paths)
        with futures.ThreadPoolExecutor(min(8, max(1, b))) as pool:
            crops = np.stack(list(pool.map(
                lambda p: image_to_crop_array(p, self.dim, self.target_ratio),
                paths,
            )))  # [B, 13, d, d, 3]
        flat = crops.reshape(b * self.n_crops, self.dim, self.dim, 3)
        pad = self.batch_images * self.n_crops - flat.shape[0]
        if pad:
            flat = np.concatenate([flat, np.zeros((pad,) + flat.shape[1:], flat.dtype)])
        feats = np.asarray(self.encode_fn(flat))[: b * self.n_crops]
        return feats.reshape(b, self.n_crops, -1)

    def run(
        self,
        items: Sequence[tuple[str, str]],
        out_dir: str,
        *,
        write_pack: bool = True,
        skip_existing: bool = True,
        log_every: int = 50,
        logger=print,
    ) -> int:
        """items: (image_path, output_name) pairs. Writes
        `<out_dir>/<name>.npy` [13, feat] per image (+ pack files)."""
        os.makedirs(out_dir, exist_ok=True)
        todo = [
            (p, n) for p, n in items
            if not (skip_existing and os.path.exists(os.path.join(out_dir, n + ".npy")))
        ]
        names, feats_all = [], []
        done = 0
        for i in range(0, len(todo), self.batch_images):
            chunk = todo[i : i + self.batch_images]
            feats = self.extract_batch([p for p, _ in chunk])
            for (_, name), f in zip(chunk, feats):
                out = os.path.join(out_dir, name + ".npy")
                os.makedirs(os.path.dirname(out), exist_ok=True)
                np.save(out, f.astype(np.float32))
                names.append(name)
                feats_all.append(f.astype(np.float32))
            done += len(chunk)
            if log_every and done % log_every < self.batch_images:
                logger(f"extract_patches: {done}/{len(todo)}")
        if write_pack and names:
            write_patch_pack(out_dir, names, np.stack(feats_all))
        return done


def write_patch_pack(out_dir: str, names: Sequence[str], feats: np.ndarray) -> None:
    """Consolidated pack consumed by `data.patch_store.PatchFeatureStore`."""
    np.save(os.path.join(out_dir, "pack.npy"), feats.astype(np.float32))
    with open(os.path.join(out_dir, "pack.names.json"), "w") as f:
        json.dump(list(names), f)


def enumerate_fashion200k(root: str, splits=("train", "test")) -> list[tuple[str, str]]:
    """(image_path, output_name) from labels/*_<split>_*.txt; names keep
    the reference's `women/... → <patch_dir>/...` relpath convention
    (`dataloader/fashion200k_patch.py:116-117`)."""
    import glob

    items = []
    seen = set()
    for split in splits:
        for f in sorted(glob.glob(os.path.join(root, "labels", f"*_{split}_*.txt"))):
            with open(f) as fr:
                for line in fr:
                    rel = line.strip().split("\t")[0]
                    if rel and rel not in seen:
                        seen.add(rel)
                        items.append((os.path.join(root, rel), rel))
    return items


def enumerate_image_dir(root: str, image_dir: str = "images",
                        exts=(".png", ".jpg", ".jpeg")) -> list[tuple[str, str]]:
    """FashionIQ/CIRR/Shoes style: every image under `<root>/<image_dir>`,
    output name = stem."""
    items = []
    base = os.path.join(root, image_dir)
    for dirpath, _, files in os.walk(base):
        for fn in sorted(files):
            if fn.lower().endswith(exts):
                full = os.path.join(dirpath, fn)
                items.append((full, os.path.splitext(fn)[0]))
    return items
