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


class TestNativeTokenizer:
    """fasttokenizer.cpp parity: identical token ids to the pure-Python
    SimpleTokenizer on the ASCII fast path, per-row fallback for
    everything else, GIL-free concurrent encodes."""

    TRICKY = [
        "is red with longer sleeves",
        "Has a FLORAL print and it's sleeveless!!",
        "  multiple   spaces\tand\ttabs ",
        "don't can't we'll they're i've i'm you'd",
        "punct...!?';:' mix 'x 123 4a5 9",
        "", " ", "'s", "'", "''ll", "1'2",
        "a&amp;b entity",            # & -> fallback (html.unescape)
        "café unicode",          # non-ASCII -> fallback
        "<|startoftext|> special",   # special-token literal -> fallback
        "<|EndOfText|>", "< |not special",
        "x" * 500,                   # truncation forces last slot = EOT
    ]

    @pytest.fixture(scope="class")
    def merges(self):
        import sys
        sys.path.insert(0, os.path.dirname(__file__))
        from test_clip import _learn_bpe_merges

        corpus = open(
            os.path.join(os.path.dirname(__file__), "fixtures",
                         "bpe_captions.txt")).read().splitlines()
        return _learn_bpe_merges(corpus, 400)

    def _pair(self, merges):
        from fashionern_aaai2024_tpu.models.clip.tokenizer import SimpleTokenizer

        tok_native = SimpleTokenizer(merges=merges)
        tok_python = SimpleTokenizer(merges=merges)
        tok_python._native_tried = True  # pin the pure-Python path
        if tok_native._get_native() is None:
            pytest.skip("native tokenizer unavailable (no toolchain)")
        return tok_native, tok_python

    def test_tricky_cases_identical(self, merges):
        tok_n, tok_p = self._pair(merges)
        np.testing.assert_array_equal(
            tok_n(self.TRICKY, 77), tok_p(self.TRICKY, 77))

    def test_fallback_rows_actually_fall_back(self, merges):
        """The C core must FLAG (not mis-encode) entity/unicode/special
        rows; flagged rows re-encode through Python inside __call__."""
        from fashionern_aaai2024_tpu.native.tokenizer import NativeBPE

        nb = NativeBPE(merges)
        _, fb = nb.encode_batch(
            ["plain ascii", "a&b", "café", "<|endoftext|>"], 16)
        assert fb.tolist() == [False, True, True, True]

    def test_ascii_fuzz_identical(self, merges):
        import random
        import string

        tok_n, tok_p = self._pair(merges)
        rng = random.Random(7)
        alphabet = string.ascii_letters + string.digits + \
            string.punctuation + "  '"
        fuzz = ["".join(rng.choice(alphabet)
                        for _ in range(rng.randint(0, 60)))
                for _ in range(500)]
        np.testing.assert_array_equal(tok_n(fuzz, 77), tok_p(fuzz, 77))

    def test_threaded_encodes_agree(self, merges):
        from concurrent.futures import ThreadPoolExecutor

        tok_n, tok_p = self._pair(merges)
        caps = [f"thread cap word{i} color{i*3}" for i in range(64)]
        want = tok_p(caps, 32)
        with ThreadPoolExecutor(8) as pool:
            outs = list(pool.map(lambda _: tok_n(caps, 32), range(16)))
        for o in outs:
            np.testing.assert_array_equal(o, want)

    def test_disabled_via_env(self, merges, monkeypatch):
        from fashionern_aaai2024_tpu.native import tokenizer as nt

        monkeypatch.setenv("FASHIONERN_NO_NATIVE", "1")
        monkeypatch.setattr(nt, "_LIB", None)
        monkeypatch.setattr(nt, "_TRIED", False)
        assert not nt.available()
        from fashionern_aaai2024_tpu.models.clip.tokenizer import SimpleTokenizer

        tok = SimpleTokenizer(merges=merges)
        assert tok._get_native() is None
        assert tok(["still works"], 16).shape == (1, 16)
