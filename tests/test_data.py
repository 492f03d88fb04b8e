"""Data layer: transforms geometry, dataset families on synthetic
fixtures, caption augmentation, loader sharding."""

import json
import os
import random

import numpy as np
import pytest
from PIL import Image

from fashionern_aaai2024_tpu.data import (
    CLIP_MEAN,
    CLIP_STD,
    CIRRDataset,
    Fashion200kDataset,
    Fashion200kTestDataset,
    Fashion200kTestQueryDataset,
    FashionIQDataset,
    Loader,
    PatchFeatureStore,
    ShoesDataset,
    generate_randomized_fiq_caption,
    get_different_word,
    join_fiq_captions,
)
from fashionern_aaai2024_tpu.data.transforms import preprocess_image, target_pad

DIM = 32
PD = 13
FD = 8


def _img(path, w=40, h=30):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(
        (np.random.default_rng(0).random((h, w, 3)) * 255).astype(np.uint8)
    ).save(path)


def _patch(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.save(path, np.random.default_rng(1).random((PD, FD)).astype(np.float32))


class TestTransforms:
    def test_targetpad_noop_below_ratio(self):
        img = Image.new("RGB", (100, 90))
        assert target_pad(img, 1.25).size == (100, 90)

    def test_targetpad_pads_above_ratio(self):
        img = Image.new("RGB", (200, 100))
        out = target_pad(img, 1.25)
        assert out.size[0] == 200 and out.size[1] > 100

    def test_output_shape_and_normalization(self):
        img = Image.new("RGB", (50, 70), (124, 117, 104))
        arr = preprocess_image(img, DIM)
        assert arr.shape == (DIM, DIM, 3)
        # constant image → constant normalized values
        want = (np.array([124, 117, 104]) / 255.0 - CLIP_MEAN) / CLIP_STD
        np.testing.assert_allclose(arr[16, 16], want, atol=1e-5)


@pytest.fixture()
def fiq_root(tmp_path):
    root = tmp_path / "fiq"
    names = [f"img{i}" for i in range(6)]
    for n in names:
        _img(str(root / "images" / f"{n}.png"))
        _patch(str(root / "fashion_local13" / f"{n}.npy"))
    triplets = [
        {"candidate": "img0", "target": "img1", "captions": ["is red", "has sleeves"]},
        {"candidate": "img2", "target": "img3", "captions": ["is blue", "is long"]},
    ]
    os.makedirs(root / "captions")
    os.makedirs(root / "image_splits")
    for split in ("train", "val"):
        (root / "captions" / f"cap.dress.{split}.json").write_text(json.dumps(triplets))
        (root / "image_splits" / f"split.dress.{split}.json").write_text(json.dumps(names))
    return str(root)


class TestFashionIQ:
    def test_relative_train(self, fiq_root):
        ds = FashionIQDataset(fiq_root, "train", ["dress"], dim=DIM)
        assert len(ds) == 2
        item = ds[0]
        assert item["ref_image"].shape == (DIM, DIM, 3)
        assert item["tar_patch"].shape == (PD, FD)
        assert item["captions"] == ["is red", "has sleeves"]

    def test_classic(self, fiq_root):
        ds = FashionIQDataset(fiq_root, "val", ["dress"], mode="classic", dim=DIM)
        assert len(ds) == 6
        assert ds[2]["name"] == "img2"

    def test_val_protocol_gallery(self, fiq_root):
        ds = FashionIQDataset(
            fiq_root, "val", ["dress"], mode="classic", dim=DIM, val_protocol=True
        )
        assert sorted(ds.image_names) == ["img0", "img1", "img2", "img3"]

    def test_corrupt_raises_by_default(self, fiq_root):
        os.remove(os.path.join(fiq_root, "fashion_local13", "img0.npy"))
        ds = FashionIQDataset(fiq_root, "train", ["dress"], dim=DIM)
        with pytest.raises(FileNotFoundError):
            ds[0]
        ds2 = FashionIQDataset(fiq_root, "train", ["dress"], dim=DIM, skip_corrupt=True)
        assert ds2[0] is None


@pytest.fixture()
def cirr_root(tmp_path):
    root = tmp_path / "cirr_ds"
    names = [f"dev-{i}" for i in range(4)]
    rel = {n: f"imgs/{n}.png" for n in names}
    for n in names:
        _img(str(root / "imgs" / f"{n}.png"))
        _patch(str(root / "cirr_local_13" / f"{n}.npy"))
    trip = [
        {
            "reference": "dev-0",
            "target_hard": "dev-1",
            "caption": "make it red",
            "img_set": {"members": names},
            "pairid": 7,
        }
    ]
    os.makedirs(root / "cirr" / "captions")
    os.makedirs(root / "cirr" / "image_splits")
    for split in ("train", "val", "test1"):
        (root / "cirr" / "captions" / f"cap.rc2.{split}.json").write_text(json.dumps(trip))
        (root / "cirr" / "image_splits" / f"split.rc2.{split}.json").write_text(
            json.dumps(rel)
        )
    return str(root)


class TestCIRR:
    def test_val_item(self, cirr_root):
        ds = CIRRDataset(cirr_root, "val", dim=DIM)
        item = ds[0]
        assert item["tar_name"] == "dev-1"
        assert len(item["group_members"]) == 4

    def test_test1_item(self, cirr_root):
        ds = CIRRDataset(cirr_root, "test1", dim=DIM)
        assert ds[0]["pair_id"] == 7

    def test_classic(self, cirr_root):
        ds = CIRRDataset(cirr_root, "val", mode="classic", dim=DIM)
        assert len(ds) == 4


@pytest.fixture()
def shoes_root(tmp_path):
    root = tmp_path / "shoes"
    rels = [f"womens/img_{i}.jpg" for i in range(3)]
    for r in rels:
        _img(str(root / r))
        _patch(str(root / "shoes_local_feature_13" / (os.path.basename(r)[:-4] + ".npy")))
    (root / "split.train.json").write_text(json.dumps(rels))
    (root / "triplet.train.json").write_text(
        json.dumps(
            [{"ReferenceImageName": rels[0], "ImageName": rels[1], "RelativeCaption": "shinier"}]
        )
    )
    return str(root)


class TestShoes:
    def test_relative(self, shoes_root):
        ds = ShoesDataset(shoes_root, "train", dim=DIM)
        item = ds[0]
        assert item["caption"] == "shinier"
        assert item["ref_name"] == "img_0"
        assert item["ref_image"].shape == (DIM, DIM, 3)


@pytest.fixture()
def f200k_root(tmp_path):
    root = tmp_path / "f200k"
    caps = ["blue long dress", "red long dress", "blue short dress", "green wool sweater"]
    lines = []
    for i, c in enumerate(caps):
        p = f"women/cat/item{i}/img{i}.jpeg"
        _img(str(root / p))
        _patch(str(root / p.replace("women", "local_features")) + ".npy")
        lines.append(f"{p}\t1\t{c}")
    os.makedirs(root / "labels")
    for split in ("train", "test"):
        (root / "labels" / f"x_{split}_0.txt").write_text("\n".join(lines) + "\n")
    (root / "test_queries.txt").write_text(
        "women/cat/item0/img0.jpeg women/cat/item1/img1.jpeg\n"
    )
    return str(root)


def _npy_patch_map(p):
    return p.replace("women", "local_features") + ".pth"


class TestFashion200k:
    def test_pair_generation(self, f200k_root):
        ds = Fashion200kDataset(f200k_root, "train", dim=DIM, seed=0)
        # blue/red long dress and blue long/short dress are modifiable pairs
        assert ds.num_modifiable_imgs == 3
        assert len(ds) > 0
        item = ds[0]
        assert item["caption"].startswith("replace ")
        assert item["ref_patch"].shape == (PD, FD)

    def test_pair_generation_deterministic(self, f200k_root):
        a = Fashion200kDataset(f200k_root, "train", dim=DIM, seed=5, load_images=False)
        b = Fashion200kDataset(f200k_root, "train", dim=DIM, seed=5, load_images=False)
        assert a.pairs == b.pairs

    def test_gallery_ids_are_captions(self, f200k_root):
        ds = Fashion200kTestDataset(f200k_root, dim=DIM)
        assert ds[0]["name"] == "blue long dress"

    def test_query_modifier(self, f200k_root):
        ds = Fashion200kTestQueryDataset(f200k_root, dim=DIM)
        assert ds[0]["caption"] == "replace blue with red"
        assert ds[0]["tar_id"] == "red long dress"


class TestCaptions:
    def test_join(self):
        assert join_fiq_captions("is red.", "has dots?") == "Is red and has dots"

    def test_randomized_four_ways(self):
        rng = random.Random(0)
        outs = {
            tuple(generate_randomized_fiq_caption(["is red", "is long"], rng))
            for _ in range(200)
        }
        assert outs == {
            ("Is red and is long",),
            ("Is long and is red",),
            ("Is red",),
            ("Is long",),
        }

    def test_get_different_word(self):
        _, _, mod = get_different_word("blue long dress", "red long dress")
        assert mod == "replace blue with red"


class TestLoader:
    def test_sharding_partitions(self, fiq_root):
        ds = FashionIQDataset(fiq_root, "val", ["dress"], mode="classic", dim=DIM,
                              load_images=False)
        seen = []
        for rank in range(3):
            loader = Loader(ds, batch_size=2, rank=rank, world_size=3, num_workers=0)
            for batch in loader:
                seen.extend(batch["name"])
        assert sorted(set(seen)) == sorted(ds.image_names)

    def test_collate_stacks_arrays(self, fiq_root):
        ds = FashionIQDataset(fiq_root, "train", ["dress"], dim=DIM)
        batch = next(iter(Loader(ds, batch_size=2, num_workers=2)))
        assert batch["ref_image"].shape == (2, DIM, DIM, 3)
        assert batch["ref_patch"].shape == (2, PD, FD)
        assert isinstance(batch["captions"][0], list)

    def test_shuffle_is_epoch_dependent(self, fiq_root):
        ds = FashionIQDataset(fiq_root, "val", ["dress"], mode="classic", dim=DIM,
                              load_images=False)
        loader = Loader(ds, batch_size=6, shuffle=True, num_workers=0)
        first = next(iter(loader))["name"]
        loader.set_epoch(1)
        second = next(iter(loader))["name"]
        assert sorted(first) == sorted(second)
        assert first != second


class TestPatchStore:
    def test_pack_roundtrip(self, tmp_path):
        root = str(tmp_path)
        feats = np.random.default_rng(0).random((3, PD, FD)).astype(np.float32)
        PatchFeatureStore.write_pack(root, ["a", "b", "c"], feats)
        store = PatchFeatureStore(root)
        np.testing.assert_array_equal(store.get("b"), feats[1])
        np.testing.assert_array_equal(store.get_batch(["c", "a"]), feats[[2, 0]])


class TestFashion200kReferenceParity:
    def test_caption_index_structures_match(self, f200k_root):
        """The caption graph (caption→imgids, parent→children, modifiable
        flags) must match the reference's `caption_index_init_`
        (`dataloader/fashion200k_patch.py:140-181`) exactly — it defines
        the training pair distribution."""
        import sys

        sys.path.insert(0, "/root/reference")
        from dataloader.fashion200k_patch import (
            Fashion200kDataset as RefFashion200k,
        )

        ref = RefFashion200k(root_path=f200k_root, split="train")
        ours = Fashion200kDataset(f200k_root, "train", load_images=False,
                                  patch_path_map=_npy_patch_map)

        assert ours.caption2imgids == ref.caption2imgids
        assert ours.parent2children_captions == ref.parent2children_captions
        assert [im["modifiable"] for im in ours.imgs] == [
            im["modifiable"] for im in ref.imgs
        ]
        assert [sorted(im["parent_captions"]) for im in ours.imgs] == [
            sorted(im["parent_captions"]) for im in ref.imgs
        ]
        assert ours.num_modifiable_imgs == ref.num_modifiable_imgs

    def test_generated_pairs_same_population(self, f200k_root):
        """Sampling is RNG-dependent (reference uses global random);
        compare the reachable pair population and invariants instead:
        every generated pair must be a valid reference-style pair."""
        ours = Fashion200kDataset(f200k_root, "train", load_images=False,
                                  patch_path_map=_npy_patch_map,
                                  n_modifications_per_image=20)
        for idx, tgt, mod in ours.pairs:
            sc = ours.imgs[idx]["captions"][0]
            tc = ours.imgs[tgt]["captions"][0]
            assert set(sc.split()) != set(tc.split())
            # modifier is the reference word-diff format
            assert mod.startswith("replace ")
            src_w, tgt_w = mod.split()[1], mod.split()[3]
            assert src_w in sc.split() and src_w not in tc.split()
            assert tgt_w in tc.split() and tgt_w not in sc.split()
            # source and target share a parent caption
            shared = set(ours.imgs[idx]["parent_captions"]) & set(
                ours.imgs[tgt]["parent_captions"])
            assert shared


class TestProcessWorkers:
    """Fork-based loader workers: same batches as the serial path, and
    the dataset is inherited (never pickled)."""

    def test_process_loader_matches_serial(self, tmp_path):
        from fashionern_aaai2024_tpu.data.loader import Loader
        from fashionern_aaai2024_tpu.tools.make_fixture import make_fixture
        from fashionern_aaai2024_tpu.data.fashioniq import FashionIQDataset

        make_fixture(str(tmp_path), "fashioniq", dim=16)
        ds = FashionIQDataset(str(tmp_path), "train", ["dress"],
                              mode="classic", dim=32)
        serial = list(Loader(ds, 5, num_workers=0))
        proc = list(Loader(ds, 5, num_workers=2, worker_type="process"))
        assert len(serial) == len(proc)
        for a, b in zip(serial, proc):
            assert a["name"] == b["name"]
            np.testing.assert_array_equal(a["image"], b["image"])
            np.testing.assert_array_equal(a["patch"], b["patch"])

    def test_unpicklable_dataset_ok(self):
        """fork inheritance means even an unpicklable dataset works."""
        from fashionern_aaai2024_tpu.data.loader import Loader

        class Unpicklable:
            def __init__(self):
                self.f = lambda i: {"x": np.full((2,), i, np.float32)}

            def __getitem__(self, i):
                return self.f(i)

            def __len__(self):
                return 7

        out = list(Loader(Unpicklable(), 3, num_workers=2,
                          worker_type="process"))
        assert [b["x"][:, 0].tolist() for b in out] == [
            [0, 1, 2], [3, 4, 5], [6]]

    def test_concurrent_process_loaders_raise(self):
        """Two process-type Loaders iterating at once would hand
        late-forked workers the wrong fork-inherited dataset; the second
        must fail loudly instead (ADVICE r2)."""
        from fashionern_aaai2024_tpu.data.loader import Loader

        class Tiny:
            def __getitem__(self, i):
                return {"x": np.full((2,), i, np.float32)}

            def __len__(self):
                return 7

        first = iter(Loader(Tiny(), 2, num_workers=2, worker_type="process"))
        next(first)  # mid-iteration: lock held
        second = Loader(Tiny(), 2, num_workers=2, worker_type="process")
        with pytest.raises(RuntimeError, match="process-type Loader"):
            next(iter(second))
        # draining the first releases the lock; a new one then works
        list(first)
        assert len(list(second)) == 4
