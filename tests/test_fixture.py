"""The synthetic fixture generator writes layouts the real dataset
classes load — every dataset family, every split/mode the CLI drives.
(The TPU dress rehearsal, benchmarks/dress_rehearsal.sh, runs the full
train→eval CLI over these same fixtures on the real chip.)"""

import numpy as np
import pytest

from fashionern_aaai2024_tpu.tools.make_fixture import make_fixture

KW = dict(dim=64, pad_mode="target", target_ratio=1.25)


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    out = {}
    for ds in ("fashioniq", "cirr", "shoes", "fashion200k"):
        root = tmp_path_factory.mktemp(ds)
        make_fixture(str(root), ds, dim=32)
        out[ds] = str(root)
    return out


class TestFixtureLayouts:
    def test_fashioniq(self, roots):
        from fashionern_aaai2024_tpu.data.fashioniq import FashionIQDataset

        rel = FashionIQDataset(roots["fashioniq"], "train", ["dress"],
                               mode="relative", **KW)
        item = rel[0]
        assert item["ref_patch"].shape == (13, 32)
        assert item["ref_image"].shape == (64, 64, 3)
        assert len(item["captions"]) == 2
        classic = FashionIQDataset(roots["fashioniq"], "val",
                                   ["dress", "shirt", "toptee"],
                                   mode="classic", **KW)
        assert len(classic) == 36
        vp = FashionIQDataset(roots["fashioniq"], "val", ["dress"],
                              mode="classic", val_protocol=True, **KW)
        assert 0 < len(vp) <= 12

    def test_cirr(self, roots):
        from fashionern_aaai2024_tpu.data.cirr import CIRRDataset

        for split, key in (("train", "tar_patch"), ("val", "tar_name"),
                           ("test1", "pair_id")):
            d = CIRRDataset(roots["cirr"], split, mode="relative", **KW)
            assert key in d[0]
            assert len(d[0]["group_members"]) == 6

    def test_shoes(self, roots):
        from fashionern_aaai2024_tpu.data.shoes import ShoesDataset

        d = ShoesDataset(roots["shoes"], "val", mode="relative", **KW)
        assert {"ref_name", "tar_name", "caption"} <= set(d[0])
        c = ShoesDataset(roots["shoes"], "train", mode="classic", **KW)
        assert c[0]["image"].shape == (64, 64, 3)

    def test_fashion200k(self, roots):
        from fashionern_aaai2024_tpu.data.fashion200k import (
            Fashion200kDataset, Fashion200kTestDataset,
            Fashion200kTestQueryDataset,
        )

        train = Fashion200kDataset(roots["fashion200k"], **KW)
        item = train[0]
        assert item["caption"].startswith("replace ")
        assert item["ref_patch"].shape == (13, 32)
        gal = Fashion200kTestDataset(roots["fashion200k"], **KW)
        assert len(gal) == 24
        q = Fashion200kTestQueryDataset(roots["fashion200k"], **KW)
        assert len(q) >= 1 and q[0]["caption"].startswith("replace ")

    def test_bpe_table_tokenizes(self, roots):
        from fashionern_aaai2024_tpu.models.clip.tokenizer import SimpleTokenizer

        tok = SimpleTokenizer(
            bpe_path=f"{roots['fashioniq']}/bpe.txt.gz")
        out = tok(["is red with a floral pattern"], 77)
        assert out.shape == (1, 77) and out[0, 0] == tok.sot_token
        assert (out[0] < tok.vocab_size).all()

    def test_patch_pack_roundtrip(self, roots):
        from fashionern_aaai2024_tpu.data.patch_store import PatchFeatureStore

        store = PatchFeatureStore(f"{roots['fashioniq']}/fashion_local13")
        a = store.get("dress0")
        b = store.get_batch(["dress0", "dress1"])
        np.testing.assert_array_equal(b[0], a)


class TestLearnableFixture:
    """`--learnable` mode: captions describe the target's visible
    attributes, so held-out queries are learnable (the accuracy soak's
    generalization mode)."""

    @pytest.fixture(scope="class")
    def root(self, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("fiq_learnable"))
        make_fixture(out, "fashioniq", dim=32, n_images=12, n_triplets=8,
                     learnable=True)
        return out

    def test_captions_describe_target_attrs(self, root):
        import json

        with open(f"{root}/fixture_attrs.json") as f:
            attrs = json.load(f)
        for split in ("train", "val"):
            with open(f"{root}/captions/cap.dress.{split}.json") as f:
                trips = json.load(f)
            for t in trips:
                color, pattern = attrs[t["target"]]
                assert t["captions"][0] == f"is {color}"
                assert t["captions"][1] == f"has {pattern} pattern"

    def test_images_carry_the_attribute_signal(self, root):
        import json

        from PIL import Image

        from fashionern_aaai2024_tpu.tools.make_fixture import _ATTR_RGB

        with open(f"{root}/fixture_attrs.json") as f:
            attrs = json.load(f)
        for name, (color, _) in list(attrs.items())[:6]:
            arr = np.asarray(Image.open(f"{root}/images/{name}.png"),
                             np.float32)
            # the dominant color must be the nearest palette entry by
            # median pixel (median ignores the pattern overlay + noise)
            med = np.median(arr.reshape(-1, 3), axis=0)
            dists = {c: np.linalg.norm(med - np.asarray(rgb))
                     for c, rgb in _ATTR_RGB.items()}
            assert min(dists, key=dists.get) == color, (name, med)

    def test_default_fixture_unchanged(self, roots):
        import os

        assert not os.path.exists(
            f"{roots['fashioniq']}/fixture_attrs.json")
