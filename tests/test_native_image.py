"""Native image pipeline (native/fastimage.cpp) parity vs PIL.

The native path's contract is BIT-EXACTNESS with the PIL pipeline the
reference uses (`dataloader/dataset.py:57-87`): same libjpeg-turbo
islow decode, and a reimplementation of Pillow's fixed-point bicubic
resampler (Resample.c) that must agree to the last u8. Every test here
asserts exact equality, not closeness.
"""

import io

import numpy as np
import pytest
from PIL import Image

from fashionern_aaai2024_tpu.data.transforms import (
    load_and_preprocess,
    preprocess_image,
)
from fashionern_aaai2024_tpu.native import image as nimg

pytestmark = pytest.mark.skipif(
    not nimg.available(), reason="native image library unavailable"
)


def _jpeg_bytes(arr: np.ndarray, quality: int = 90, **save_kw) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=quality, **save_kw)
    return buf.getvalue()


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


class TestDecodeParity:
    def test_baseline_rgb(self, rng):
        for shape in ((360, 300), (123, 457), (41, 33), (1, 1)):
            arr = rng.integers(0, 256, shape + (3,), dtype=np.uint8)
            data = _jpeg_bytes(arr)
            pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
            nat = nimg.decode_jpeg(data)
            assert nat is not None and np.array_equal(pil, nat), shape

    def test_progressive(self, rng):
        arr = rng.integers(0, 256, (97, 211, 3), dtype=np.uint8)
        data = _jpeg_bytes(arr, progressive=True)
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert np.array_equal(pil, nimg.decode_jpeg(data))

    def test_grayscale_replicates(self, rng):
        arr = rng.integers(0, 256, (100, 80), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr, "L").save(buf, "JPEG", quality=90)
        data = buf.getvalue()
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert np.array_equal(pil, nimg.decode_jpeg(data))

    def test_subsampling_modes(self, rng):
        arr = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
        for ss in (0, 1, 2):  # 4:4:4, 4:2:2, 4:2:0
            data = _jpeg_bytes(arr, subsampling=ss)
            pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
            assert np.array_equal(pil, nimg.decode_jpeg(data)), ss

    def test_rejects_garbage(self):
        assert nimg.decode_jpeg(b"not a jpeg") is None
        assert nimg.decode_jpeg(b"\xff\xd8\xff\xe0 truncated") is None

    def test_rejects_cmyk(self, rng):
        arr = rng.integers(0, 256, (32, 32, 4), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr, "CMYK").save(buf, "JPEG", quality=90)
        assert nimg.decode_jpeg(buf.getvalue()) is None


class TestResizeParity:
    """Pillow-exact fixed-point bicubic: up/down/identity/asymmetric."""

    @pytest.mark.parametrize(
        "in_shape,out_size",
        [
            ((360, 300), (269, 224)),   # reference targetpad geometry
            ((77, 191), (288, 288)),
            ((224, 224), (16, 16)),     # heavy downscale (antialias taps)
            ((31, 500), (500, 100)),
            ((50, 60), (60, 50)),       # identity width after transpose-ish
            ((40, 40), (40, 80)),       # identity horizontal pass
            ((40, 40), (80, 40)),       # identity vertical pass
        ],
    )
    def test_rgb(self, rng, in_shape, out_size):
        src = rng.integers(0, 256, in_shape + (3,), dtype=np.uint8)
        ow, oh = out_size
        pil = np.asarray(Image.fromarray(src).resize((ow, oh), Image.BICUBIC))
        assert np.array_equal(pil, nimg.resize_bicubic(src, ow, oh))

    def test_single_channel(self, rng):
        src = rng.integers(0, 256, (123, 77), dtype=np.uint8)
        pil = np.asarray(Image.fromarray(src, "L").resize((45, 201), Image.BICUBIC))
        assert np.array_equal(pil, nimg.resize_bicubic(src, 45, 201))


class TestPipelineParity:
    @pytest.mark.parametrize("pad", ["target", "square", "none"])
    @pytest.mark.parametrize("dim", [224, 288])
    def test_full_pipeline(self, rng, pad, dim):
        for shape in ((360, 300), (450, 300), (100, 437)):
            arr = rng.integers(0, 256, shape + (3,), dtype=np.uint8)
            data = _jpeg_bytes(arr, quality=92)
            pil = preprocess_image(Image.open(io.BytesIO(data)), dim, pad)
            nat = nimg.decode_preprocess(data, dim, pad)
            assert nat is not None
            assert np.array_equal(pil, nat), (shape, pad, dim)

    def test_no_normalize_u8(self, rng):
        arr = rng.integers(0, 256, (300, 360, 3), dtype=np.uint8)
        data = _jpeg_bytes(arr)
        pil = preprocess_image(
            Image.open(io.BytesIO(data)), 224, "target", normalize=False)
        nat = nimg.decode_preprocess(data, 224, "target", normalize=False)
        assert nat.dtype == np.uint8
        assert np.array_equal((pil * 255).round().astype(np.uint8), nat)

    def test_batch_matches_per_item_and_flags_failures(self, rng):
        items = []
        for _ in range(5):
            h, w = int(rng.integers(40, 400)), int(rng.integers(40, 400))
            items.append(_jpeg_bytes(
                rng.integers(0, 256, (h, w, 3), dtype=np.uint8), quality=85))
        items.append(b"not a jpeg")
        batch, statuses = nimg.decode_preprocess_batch(items, 224, "target")
        assert statuses[:5].tolist() == [0] * 5
        assert statuses[5] != 0
        assert float(np.abs(batch[5]).sum()) == 0.0
        for i, data in enumerate(items[:5]):
            assert np.array_equal(nimg.decode_preprocess(data, 224, "target"),
                                  batch[i])

    def test_load_and_preprocess_dispatch(self, rng, tmp_path):
        """The dataset-facing loader: native for JPEG, PIL for PNG,
        identical output either way."""
        arr = rng.integers(0, 256, (360, 300, 3), dtype=np.uint8)
        jpg = tmp_path / "a.jpg"
        jpg.write_bytes(_jpeg_bytes(arr))
        png = tmp_path / "a.png"
        Image.fromarray(arr).save(png)

        out_jpg = load_and_preprocess(str(jpg), 224, "target")
        with Image.open(jpg) as img:
            assert np.array_equal(out_jpg, preprocess_image(img, 224, "target"))
        out_png = load_and_preprocess(str(png), 224, "target")
        with Image.open(png) as img:
            assert np.array_equal(out_png, preprocess_image(img, 224, "target"))

    def test_load_and_preprocess_rgb_first(self, rng, tmp_path):
        """Fashion200k's convert-before-geometry ordering is preserved
        in the PIL fallback (palette PNG where ordering matters)."""
        arr = rng.integers(0, 256, (60, 90, 3), dtype=np.uint8)
        p = tmp_path / "p.png"
        Image.fromarray(arr).convert("P", palette=Image.ADAPTIVE).save(p)
        out = load_and_preprocess(str(p), 32, "target", rgb_first=True)
        with Image.open(p) as img:
            ref = preprocess_image(img.convert("RGB"), 32, "target")
        assert np.array_equal(out, ref)


class TestRobustness:
    """The C pipeline must never crash the process: fuzzed inputs
    return error statuses (→ PIL fallback), and the code is
    state-free so concurrent decodes from Python threads (which it
    releases the GIL for) must agree with serial results. An
    ASAN-instrumented build of the same drives ran clean (BASELINE.md
    native ledger)."""

    def test_fuzzed_inputs_never_crash(self, rng):
        arr = rng.integers(0, 256, (60, 80, 3), dtype=np.uint8)
        base = bytearray(_jpeg_bytes(arr, quality=80))
        ok = err = 0
        for _ in range(200):
            m = bytearray(base)
            for _ in range(int(rng.integers(1, 4))):
                m[int(rng.integers(0, len(m)))] = int(rng.integers(0, 256))
            if rng.random() < 0.5:
                m = m[: int(rng.integers(2, len(m)))]
            out = nimg.decode_preprocess(bytes(m), 32, "target")
            if out is None:
                err += 1
            else:
                ok += 1
                assert out.shape == (32, 32, 3) and np.isfinite(out).all()
        assert ok + err == 200  # every input handled, no crash

    def test_degenerate_geometries(self, rng):
        for (h, w) in ((1, 1), (2, 3), (1, 400), (400, 1)):
            data = _jpeg_bytes(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
            out = nimg.decode_preprocess(data, 16, "square")
            pil = preprocess_image(
                Image.open(io.BytesIO(data)), 16, "square")
            if out is not None:
                assert np.array_equal(out, pil), (h, w)

    def test_concurrent_threads_match_serial(self, rng):
        import concurrent.futures as cf

        items = [
            _jpeg_bytes(rng.integers(
                0, 256,
                (int(rng.integers(40, 300)), int(rng.integers(40, 300)), 3),
                dtype=np.uint8))
            for _ in range(24)
        ]
        serial = [nimg.decode_preprocess(d, 224, "target") for d in items]
        with cf.ThreadPoolExecutor(max_workers=8) as pool:
            threaded = list(pool.map(
                lambda d: nimg.decode_preprocess(d, 224, "target"), items))
        for s, t in zip(serial, threaded):
            assert np.array_equal(s, t)


class TestReviewFixes:
    def test_huge_declared_dims_rejected_not_oom(self, rng):
        """A corrupt/hostile SOF advertising 65535x65535 (12.9 GB) must
        return an error (PIL fallback), not allocate."""
        data = bytearray(_jpeg_bytes(
            rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)))
        i = bytes(data).find(b"\xff\xc0")  # SOF0: len(2) prec(1) H(2) W(2)
        assert i > 0
        data[i + 5:i + 9] = b"\xff\xff\xff\xff"
        assert nimg.decode_preprocess(bytes(data), 224, "target") is None
        assert nimg.decode_jpeg(bytes(data)) is None

    def test_unnormalized_float_contract(self, rng, tmp_path):
        """load_and_preprocess(normalize=False) returns float32 [0,1]
        from BOTH the native and PIL paths."""
        arr = rng.integers(0, 256, (60, 80, 3), dtype=np.uint8)
        p = tmp_path / "x.jpg"
        p.write_bytes(_jpeg_bytes(arr))
        out = load_and_preprocess(str(p), 32, "target", normalize=False)
        with Image.open(p) as img:
            ref = preprocess_image(img, 32, "target", normalize=False)
        assert out.dtype == np.float32 and out.max() <= 1.0
        assert np.array_equal(out, ref)


class TestExtractCrops:
    """Fused native 13-crop extraction (offline patch pipeline) is
    bit-identical to the PIL path: decode → 360² board → 2×2+3×3 grid →
    per-crop bicubic to dim² → normalize."""

    def test_matches_pil_path(self, rng, tmp_path):
        from fashionern_aaai2024_tpu.tools.extract_patches import (
            RESIZE, cut_crops, image_to_crop_array)

        for i, shape in enumerate(((360, 300), (123, 457), (80, 80))):
            arr = rng.integers(0, 256, shape + (3,), dtype=np.uint8)
            p = tmp_path / f"{i}.jpg"
            p.write_bytes(_jpeg_bytes(arr))
            nat = image_to_crop_array(str(p), 64)  # native path
            with Image.open(p) as img:
                board = img.convert("RGB").resize((RESIZE, RESIZE), Image.BICUBIC)
            pil = np.stack([preprocess_image(c, 64, "target", 1.25)
                            for c in cut_crops(board)])
            assert nat.shape == (13, 64, 64, 3)
            assert np.array_equal(nat, pil), (i, shape)

    def test_small_ratio_falls_back(self, rng, tmp_path):
        """target_ratio <= 1.0 pads square crops — native path must
        decline so the PIL pipeline handles it."""
        from fashionern_aaai2024_tpu.tools.extract_patches import (
            RESIZE, cut_crops, image_to_crop_array)

        arr = rng.integers(0, 256, (100, 120, 3), dtype=np.uint8)
        p = tmp_path / "x.jpg"
        p.write_bytes(_jpeg_bytes(arr))
        out = image_to_crop_array(str(p), 32, target_ratio=0.9)
        with Image.open(p) as img:
            board = img.convert("RGB").resize((RESIZE, RESIZE), Image.BICUBIC)
        pil = np.stack([preprocess_image(c, 32, "target", 0.9)
                        for c in cut_crops(board)])
        assert np.array_equal(out, pil)

    def test_non_jpeg_falls_back(self, rng, tmp_path):
        from fashionern_aaai2024_tpu.tools.extract_patches import (
            image_to_crop_array)

        arr = rng.integers(0, 256, (90, 70, 3), dtype=np.uint8)
        p = tmp_path / "x.png"
        Image.fromarray(arr).save(p)
        out = image_to_crop_array(str(p), 32)
        assert out.shape == (13, 32, 32, 3) and np.isfinite(out).all()
