"""Native loader-core tests: C++ vs numpy parity, fallback path, and
integration through PatchFeatureStore / transforms."""

import importlib
import os

import numpy as np
import pytest
from PIL import Image

from fashionern_aaai2024_tpu import native
from fashionern_aaai2024_tpu.data.patch_store import PatchFeatureStore
from fashionern_aaai2024_tpu.data.transforms import CLIP_MEAN, CLIP_STD, preprocess_image


class TestBuild:
    def test_native_available(self):
        # g++ is baked into the image; the lib must actually build here
        assert native.available()


class TestGatherRows:
    def test_matches_numpy(self, rng):
        pack = rng.standard_normal((50, 13, 8)).astype(np.float32)
        idx = rng.integers(0, 50, 17)
        got = native.gather_rows(pack, idx)
        np.testing.assert_array_equal(got, pack[idx])

    def test_large_batch(self, rng):
        pack = rng.standard_normal((2048, 13, 64)).astype(np.float32)
        idx = rng.integers(0, 2048, 1024)
        got = native.gather_rows(pack, idx)
        np.testing.assert_array_equal(got, pack[idx])

    def test_out_of_range_raises(self, rng):
        pack = rng.standard_normal((4, 3)).astype(np.float32)
        if native.available():
            with pytest.raises(IndexError):
                native.gather_rows(pack, [0, 9])
        else:
            with pytest.raises(IndexError):
                native.gather_rows(pack, [0, 9])

    def test_non_contiguous_falls_back(self, rng):
        pack = rng.standard_normal((20, 8)).astype(np.float32)[:, ::2]
        got = native.gather_rows(pack, [1, 3])
        np.testing.assert_array_equal(got, pack[[1, 3]])


class TestNormalize:
    def test_matches_numpy(self, rng):
        u8 = rng.integers(0, 256, (5, 16, 16, 3)).astype(np.uint8)
        got = native.normalize_images(u8)
        want = ((u8.astype(np.float32) / 255.0) - CLIP_MEAN) / CLIP_STD
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_wrong_channels(self):
        with pytest.raises(ValueError):
            native.normalize_images(np.zeros((4, 4, 4), np.uint8))

    def test_preprocess_image_uses_it(self):
        img = Image.new("RGB", (50, 50), (124, 117, 104))
        arr = preprocess_image(img, 32)
        want = (np.array([124, 117, 104], np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
        np.testing.assert_allclose(arr[10, 10], want, atol=1e-5)


class TestDisabledFallback:
    def test_env_gate(self, rng, monkeypatch):
        monkeypatch.setenv("FASHIONERN_NO_NATIVE", "1")
        import fashionern_aaai2024_tpu.native as nat

        old_lib, old_tried = nat._LIB, nat._TRIED
        nat._LIB, nat._TRIED = None, False
        try:
            assert not nat.available()
            pack = rng.standard_normal((6, 4)).astype(np.float32)
            np.testing.assert_array_equal(nat.gather_rows(pack, [2, 0]), pack[[2, 0]])
            u8 = rng.integers(0, 256, (2, 4, 4, 3)).astype(np.uint8)
            want = ((u8.astype(np.float32) / 255.0) - CLIP_MEAN) / CLIP_STD
            np.testing.assert_allclose(nat.normalize_images(u8), want, atol=1e-6)
        finally:
            nat._LIB, nat._TRIED = old_lib, old_tried


class TestStoreIntegration:
    def test_pack_batch_uses_gather(self, tmp_path, rng):
        feats = rng.standard_normal((9, 13, 8)).astype(np.float32)
        names = [f"n{i}" for i in range(9)]
        PatchFeatureStore.write_pack(str(tmp_path), names, feats)
        store = PatchFeatureStore(str(tmp_path))
        batch = store.get_batch(["n3", "n1", "n8"])
        np.testing.assert_array_equal(batch, feats[[3, 1, 8]])
