"""Image preprocessing: pad → bicubic resize → center crop → normalize.

Host-side geometry matches the reference exactly
(`dataloader/dataset.py:9-87`): `TargetPad` pads only when the aspect
ratio exceeds the target (default 1.25), `SquarePad` always pads to
square; both then shorter-side bicubic resize + center crop. PIL does
the resampling (torchvision delegates PIL-image resizing to PIL, so the
pixels are bit-identical to the reference pipeline).

Output is float32 NHWC (TPU-native layout), CLIP-normalized. The
normalize step can also run on device for throughput
(`normalize_on_device`), e.g. inside the gallery-embedding pipeline.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _pad_to(image: Image.Image, hp: int, vp: int) -> Image.Image:
    if hp == 0 and vp == 0:
        return image
    w, h = image.size
    out = Image.new(image.mode, (w + 2 * hp, h + 2 * vp), 0)
    out.paste(image, (hp, vp))
    return out


def square_pad(image: Image.Image) -> Image.Image:
    """Zero-pad to square (`dataset.py:9-28`)."""
    w, h = image.size
    max_wh = max(w, h)
    return _pad_to(image, int((max_wh - w) / 2), int((max_wh - h) / 2))


def target_pad(image: Image.Image, target_ratio: float = 1.25) -> Image.Image:
    """Pad only if aspect ratio exceeds `target_ratio` (`dataset.py:31-54`)."""
    w, h = image.size
    actual = max(w, h) / min(w, h)
    if actual < target_ratio:
        return image
    scaled_max_wh = max(w, h) / target_ratio
    hp = max(int((scaled_max_wh - w) / 2), 0)
    vp = max(int((scaled_max_wh - h) / 2), 0)
    return _pad_to(image, hp, vp)


def _resize_shorter(image: Image.Image, size: int) -> Image.Image:
    """torchvision `Resize(size)`: shorter side → size, keep aspect."""
    w, h = image.size
    if w <= h:
        new_w, new_h = size, max(1, round(h * size / w))
    else:
        new_w, new_h = max(1, round(w * size / h)), size
    return image.resize((new_w, new_h), Image.BICUBIC)


def _center_crop(image: Image.Image, size: int) -> Image.Image:
    w, h = image.size
    if w < size or h < size:  # torchvision pads when smaller
        out = Image.new("RGB", (max(w, size), max(h, size)), 0)
        out.paste(image.convert("RGB"), ((out.width - w) // 2, (out.height - h) // 2))
        image, (w, h) = out, out.size
    left = int(round((w - size) / 2.0))
    top = int(round((h - size) / 2.0))
    return image.crop((left, top, left + size, top + size))


def _to_normalized_array(image: Image.Image) -> np.ndarray:
    u8 = np.asarray(image.convert("RGB"), np.uint8)  # [H, W, 3]
    from fashionern_aaai2024_tpu import native

    return native.normalize_images(u8)


def preprocess_image(
    image: Image.Image,
    dim: int,
    pad_mode: str = "target",
    target_ratio: float = 1.25,
    normalize: bool = True,
    as_uint8: bool = False,
) -> np.ndarray:
    """Full pipeline → float32 [dim, dim, 3] (NHWC).

    `as_uint8=True` skips normalization and returns the raw u8 pixels —
    the low-bandwidth feed (4× fewer bytes to collate and upload);
    `CLIP.encode_image` normalizes u8 inputs on device."""
    if pad_mode == "target":
        image = target_pad(image, target_ratio)
    elif pad_mode == "square":
        image = square_pad(image)
    elif pad_mode != "none":
        raise ValueError(f"unknown pad_mode {pad_mode!r}")
    image = _resize_shorter(image, dim)
    image = _center_crop(image, dim)
    if as_uint8:
        return np.asarray(image.convert("RGB"), np.uint8)
    if normalize:
        return _to_normalized_array(image)
    return np.asarray(image.convert("RGB"), np.float32) / 255.0


def load_and_preprocess(
    path: str,
    dim: int,
    pad_mode: str = "target",
    target_ratio: float = 1.25,
    normalize: bool = True,
    rgb_first: bool = False,
    as_uint8: bool = False,
) -> np.ndarray:
    """Decode + preprocess straight from a file path → float32 [dim, dim, 3].

    `rgb_first` converts to RGB before the geometry in the PIL fallback
    (Fashion200k's reference ordering, `fashion200k_patch.py:116`); for
    the JPEG modes the native path handles (gray/RGB), convert-first and
    convert-last are pixel-identical, so the flag only matters for the
    exotic fallback inputs.

    Baseline/progressive gray/RGB JPEGs take the native C pipeline
    (fastimage.cpp: libjpeg decode + Pillow-exact fixed-point bicubic +
    fused pad/crop/normalize — bit-identical to the PIL path, pinned by
    tests/test_native_image.py, GIL-free under thread workers). Anything
    else (PNG, CMYK JPEG, corrupt tail, missing toolchain) falls back to
    the PIL pipeline above. `FASHIONERN_NO_NATIVE=1` disables the fast
    path entirely.
    """
    with open(path, "rb") as f:
        data = f.read()
    from fashionern_aaai2024_tpu.native import image as native_image

    if native_image.is_jpeg(data):
        out = native_image.decode_preprocess(
            data, dim, pad_mode, target_ratio, normalize and not as_uint8)
        if out is not None:
            if out.dtype == np.uint8 and not as_uint8:
                # normalize=False contract is float32 in [0, 1]
                return out.astype(np.float32) / 255.0
            return out
    import io

    with Image.open(io.BytesIO(data)) as img:
        if rgb_first:
            img = img.convert("RGB")
        return preprocess_image(img, dim, pad_mode, target_ratio, normalize,
                                as_uint8)


def targetpad_transform(target_ratio: float = 1.25, dim: int = 288):
    """Callable mirroring reference `targetpad_transform` (`dataset.py:73-87`)."""
    return lambda img: preprocess_image(img, dim, "target", target_ratio)


def squarepad_transform(dim: int = 288):
    """Callable mirroring reference `squarepad_transform` (`dataset.py:57-70`)."""
    return lambda img: preprocess_image(img, dim, "square")


def normalize_on_device(images_01):
    """Device-side CLIP normalization for [B, H, W, 3] in [0, 1]."""
    import jax.numpy as jnp

    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)
    return (images_01 - mean) / std
