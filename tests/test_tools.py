"""Tools tests: crop geometry parity vs the reference cut functions,
batched extraction → PatchFeatureStore round-trip, .pth conversion,
checkpoint conversion, HTML visualizer."""

import json
import os
import sys

import numpy as np
import pytest
import torch
from PIL import Image

from fashionern_aaai2024_tpu.data.patch_store import PatchFeatureStore
from fashionern_aaai2024_tpu.tools.convert_patches import build_pack, convert_dir
from fashionern_aaai2024_tpu.tools.extract_patches import (
    PatchExtractor,
    cut_crops,
    enumerate_fashion200k,
    image_to_crop_array,
)
from fashionern_aaai2024_tpu.tools.visualize import write_retrieval_html

sys.path.insert(0, "/root/reference")


class TestCropGeometry:
    def test_matches_reference_cut_functions(self):
        # reference cut_image_4/cut_image_9 geometry
        # (`extract_patch_features_200k.py:25-51`), reproduced here because
        # the reference module imports the unavailable `clip` package at top
        def ref_cut(image, g):
            w, h = image.size
            iw, ih = int(w / g), int(h / g)
            return [
                image.crop((j * iw, i * ih, (j + 1) * iw, (i + 1) * ih))
                for i in range(g) for j in range(g)
            ]

        g = np.random.default_rng(0)
        img = Image.fromarray((g.random((360, 360, 3)) * 255).astype(np.uint8))
        ours = cut_crops(img)
        theirs = ref_cut(img, 2) + ref_cut(img, 3)
        assert len(ours) == len(theirs) == 13
        for a, b in zip(ours, theirs):
            assert a.size == b.size
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_crop_array_shape(self, tmp_path):
        g = np.random.default_rng(1)
        p = tmp_path / "x.png"
        Image.fromarray((g.random((100, 80, 3)) * 255).astype(np.uint8)).save(p)
        arr = image_to_crop_array(str(p), dim=32)
        assert arr.shape == (13, 32, 32, 3)
        assert np.isfinite(arr).all()


class TestPatchExtractor:
    def test_extract_and_store_roundtrip(self, tmp_path):
        g = np.random.default_rng(2)
        paths = []
        for i in range(5):
            p = tmp_path / f"im{i}.png"
            Image.fromarray((g.random((64, 64, 3)) * 255).astype(np.uint8)).save(p)
            paths.append((str(p), f"im{i}"))

        def fake_encode(flat):  # [N, 32, 32, 3] -> [N, 7]
            return flat.reshape(flat.shape[0], -1)[:, :7] * 2.0

        ex = PatchExtractor(fake_encode, dim=32, batch_images=2)
        out = str(tmp_path / "patches")
        n = ex.run(paths, out, log_every=0)
        assert n == 5
        store = PatchFeatureStore(out)
        feats = store.get("im3")
        assert feats.shape == (13, 7)
        # pack was written and is preferred
        assert os.path.exists(os.path.join(out, "pack.npy"))
        direct = np.load(os.path.join(out, "im3.npy"))
        np.testing.assert_allclose(feats, direct, rtol=1e-6)

    def test_skip_existing(self, tmp_path):
        g = np.random.default_rng(3)
        p = tmp_path / "a.png"
        Image.fromarray((g.random((64, 64, 3)) * 255).astype(np.uint8)).save(p)
        calls = []

        def fake_encode(flat):
            calls.append(1)
            return flat.reshape(flat.shape[0], -1)[:, :4]

        ex = PatchExtractor(fake_encode, dim=32, batch_images=2)
        out = str(tmp_path / "o")
        assert ex.run([(str(p), "a")], out, log_every=0) == 1
        assert ex.run([(str(p), "a")], out, log_every=0) == 0
        assert len(calls) == 1


class TestEnumerate200k:
    def test_label_paths(self, tmp_path):
        os.makedirs(tmp_path / "labels")
        (tmp_path / "labels" / "dress_train_detect_all.txt").write_text(
            "women/d/1.jpeg\tcap one\nwomen/d/2.jpeg\tcap two\n"
        )
        (tmp_path / "labels" / "dress_test_detect_all.txt").write_text(
            "women/d/2.jpeg\tcap two\nwomen/d/3.jpeg\tcap three\n"
        )
        items = enumerate_fashion200k(str(tmp_path))
        names = [n for _, n in items]
        assert names == ["women/d/1.jpeg", "women/d/2.jpeg", "women/d/3.jpeg"]
        assert items[0][0] == str(tmp_path / "women/d/1.jpeg")


class TestConvertPatches:
    def test_pth_dir_conversion(self, tmp_path):
        src = tmp_path / "pth"
        os.makedirs(src / "sub")
        a = torch.randn(13, 6)
        b = torch.randn(13, 6)
        torch.save(a, src / "x.pth")
        torch.save(b, src / "sub" / "y.pth")
        dst = str(tmp_path / "npy")
        n = convert_dir(str(src), dst, logger=lambda *_: None)
        assert n == 2
        store = PatchFeatureStore(dst)
        np.testing.assert_allclose(store.get("x"), a.numpy(), rtol=1e-6)
        np.testing.assert_allclose(store.get("sub/y"), b.numpy(), rtol=1e-6)

    def test_build_pack_from_npy(self, tmp_path):
        for i in range(3):
            np.save(tmp_path / f"n{i}.npy", np.full((13, 4), i, np.float32))
        n = build_pack(str(tmp_path))
        assert n == 3
        names = json.load(open(tmp_path / "pack.names.json"))
        assert sorted(names) == ["n0", "n1", "n2"]


class TestConvertCheckpoint:
    def test_ern_roundtrip(self, tmp_path):
        sys.path.insert(0, "/root/reference")
        from models.model import ERN as TorchERN

        torch_ern = TorchERN(clip_model=None, feature_dim=24, device="cpu")
        ckpt = tmp_path / "ern.pth"
        torch.save(torch_ern.state_dict(), ckpt)
        from fashionern_aaai2024_tpu.tools.convert_checkpoint import convert

        out = str(tmp_path / "orbax")
        variables = convert(str(ckpt), out, kind="ern")
        assert "params" in variables
        from fashionern_aaai2024_tpu.train.checkpoint import restore_params

        restored = restore_params(out)
        got = jax_leaves_sum(restored)
        want = jax_leaves_sum(variables)
        assert got == pytest.approx(want, rel=1e-5)


def jax_leaves_sum(tree):
    import jax

    return float(sum(np.asarray(x).astype(np.float64).sum()
                     for x in jax.tree_util.tree_leaves(tree)))


class TestVisualizer:
    def test_html_output(self, tmp_path):
        g = np.random.default_rng(4)
        imgs = []
        for i in range(4):
            p = tmp_path / f"v{i}.png"
            Image.fromarray((g.random((32, 32, 3)) * 255).astype(np.uint8)).save(p)
            imgs.append(str(p))
        out = write_retrieval_html(
            str(tmp_path / "out.html"),
            [{"ref_image": imgs[0], "caption": "make it <red>",
              "results": imgs[1:], "target": imgs[2]}],
            k=3,
        )
        doc = open(out).read()
        assert doc.count("data:image/jpeg;base64,") == 4
        assert 'class="hit"' in doc
        assert "&lt;red&gt;" in doc  # caption escaped


class TestFetchBPE:
    def _fake_table_bytes(self):
        import gzip
        import io

        need = 49152 - 256 - 2 + 1
        lines = ["bpe_simple_vocab_16e6 synthetic header"]
        lines += [f"tok{i} en{i}</w>" for i in range(need + 10)]
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb") as g:
            g.write("\n".join(lines).encode("utf-8"))
        return buf.getvalue()

    def test_fetch_verify_install_discover(self, tmp_path, monkeypatch):
        import contextlib
        import hashlib
        import io
        import urllib.request

        from fashionern_aaai2024_tpu.models.clip import tokenizer as tok
        from fashionern_aaai2024_tpu.tools import fetch_bpe as fb

        data = self._fake_table_bytes()

        @contextlib.contextmanager
        def fake_urlopen(url, timeout=0):
            yield io.BytesIO(data)

        monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
        # wrong hash refuses to install
        monkeypatch.setenv("FASHIONERN_BPE_SHA256", "0" * 64)
        with pytest.raises(ValueError, match="SHA-256 mismatch"):
            fb.fetch_bpe(str(tmp_path / "a"))
        # correct hash installs; default_bpe_path discovers via env
        monkeypatch.setenv("FASHIONERN_BPE_SHA256",
                           hashlib.sha256(data).hexdigest())
        dest = fb.fetch_bpe(str(tmp_path / "a"))
        assert dest.endswith(tok.BPE_FILENAME)
        monkeypatch.setenv("FASHIONERN_BPE_PATH", dest)
        assert tok.default_bpe_path() == dest
        t = tok.SimpleTokenizer(bpe_path=dest)
        assert t.vocab_size == 49408
        # idempotent second call
        assert fb.fetch_bpe(str(tmp_path / "a")) == dest

    def test_sanity_check_rejects_short_table(self):
        import gzip
        import io

        from fashionern_aaai2024_tpu.tools import fetch_bpe as fb

        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb") as g:
            g.write(b"header\na b\nc d\n")
        with pytest.raises(ValueError, match="too short"):
            fb._sanity_check_table(buf.getvalue())
