"""Evaluator-pipeline tests: InferenceAPI padding invariance and the
full per-dataset evaluators (gallery embed → query → refine → top-k →
recall) on synthetic data with a tiny model."""

import jax
import numpy as np
import pytest

from fashionern_aaai2024_tpu.data.loader import Loader
from fashionern_aaai2024_tpu.models import composed
from fashionern_aaai2024_tpu.models.clip import config as clip_config
from fashionern_aaai2024_tpu.retrieval import evaluate as E

TINY = clip_config.CLIPConfig(
    name="vit-test",
    vision=clip_config.VisionConfig(
        kind="vit", image_size=32, embed_dim=24, width=64, layers=2, heads=4,
        patch_size=16,
    ),
    text=clip_config.TextConfig(
        vocab_size=100, context_length=16, width=32, heads=4, layers=2, embed_dim=24
    ),
)
DIM = 24
N_GALLERY = 20


def fake_tokenizer(texts, context_length=16):
    out = np.zeros((len(texts), context_length), np.int32)
    for i, t in enumerate(texts):
        h = [hash(w) % 97 + 1 for w in t.split()][:context_length]
        out[i, : len(h)] = h
    return out


@pytest.fixture(scope="module")
def api():
    model = composed.ComposedCIRModel(TINY, patch_num=13)
    k = jax.random.PRNGKey(0)
    g = np.random.default_rng(0)
    variables = model.init(
        {"params": k, "dropout": k},
        g.random((2, 32, 32, 3), dtype=np.float32),
        g.random((2, 32, 32, 3), dtype=np.float32),
        g.integers(0, 100, (2, 16)).astype(np.int32),
        g.standard_normal((2, 13, DIM), dtype=np.float32),
        g.standard_normal((2, 13, DIM), dtype=np.float32),
        deterministic=False, method=model.train_forward,
    )
    return E.InferenceAPI(model, variables, batch_size=8,
                          context_length=16, tokenizer=fake_tokenizer)


def make_gallery_items(names):
    g = np.random.default_rng(7)
    return [
        {
            "name": n,
            "image": g.random((32, 32, 3), dtype=np.float32),
            "patch": g.standard_normal((13, DIM), dtype=np.float32),
        }
        for n in names
    ]


class TestInferenceAPIPadding:
    def test_encode_image_pad_invariant(self, api):
        g = np.random.default_rng(1)
        imgs = g.random((5, 32, 32, 3), dtype=np.float32)
        full, _ = api.encode_image(imgs)
        one, _ = api.encode_image(imgs[:1])
        np.testing.assert_allclose(full[:1], one, atol=1e-5)

    def test_query_pad_invariant(self, api):
        g = np.random.default_rng(2)
        rf = g.standard_normal((5, DIM)).astype(np.float32)
        rp = g.standard_normal((5, 13, DIM)).astype(np.float32)
        tg = g.standard_normal((5, DIM)).astype(np.float32)
        ts = g.standard_normal((5, 16, DIM)).astype(np.float32)
        full = api.query(rf, rp, tg, ts)
        two = api.query(rf[:2], rp[:2], tg[:2], ts[:2])
        np.testing.assert_allclose(full[:2], two, atol=1e-5)
        assert np.isfinite(full).all()
        # DVR output is L2-normalized
        np.testing.assert_allclose(np.linalg.norm(full, axis=-1), 1.0, atol=1e-4)

    def test_refine_gallery_chunking(self, api):
        g = np.random.default_rng(3)
        feats = g.standard_normal((11, DIM)).astype(np.float32)
        locals_ = g.standard_normal((11, 13, DIM)).astype(np.float32)
        a = api.refine_gallery(feats, locals_, chunk=4)
        b = api.refine_gallery(feats, locals_, chunk=11)
        np.testing.assert_allclose(a, b, atol=1e-5)


class TestFIQEvaluator:
    def test_end_to_end(self, api):
        names = [f"img{i}" for i in range(N_GALLERY)]
        classic = Loader(make_gallery_items(names), 8, num_workers=0)
        g = np.random.default_rng(11)
        rel_items = [
            {
                "ref_name": names[i],
                "tar_name": names[(i + 3) % N_GALLERY],
                "captions": ["is red", "has sleeves"],
                "ref_patch": g.standard_normal((13, DIM)).astype(np.float32),
            }
            for i in range(10)
        ]
        relative = Loader(rel_items, 8, num_workers=0)
        m = E.evaluate_fiq_split(api, classic, relative)
        assert set(m) == {"recall_at10", "recall_at50", "avg"}
        assert 0.0 <= m["recall_at10"] <= m["recall_at50"] <= 100.0
        # K ≥ gallery size → every target found
        assert m["recall_at50"] == 100.0

    def test_val_protocol_ks(self, api):
        names = [f"img{i}" for i in range(N_GALLERY)]
        classic = Loader(make_gallery_items(names), 8, num_workers=0)
        g = np.random.default_rng(12)
        rel_items = [
            {
                "ref_name": names[i],
                "tar_name": names[(i + 1) % N_GALLERY],
                "captions": ["a", "b"],
                "ref_patch": g.standard_normal((13, DIM)).astype(np.float32),
            }
            for i in range(6)
        ]
        relative = Loader(rel_items, 8, num_workers=0)
        m = E.evaluate_fiq_split(api, classic, relative, ks=(1, 5, 10, 15, 20))
        assert set(m) == {f"recall_at{k}" for k in (1, 5, 10, 15, 20)} | {"avg"}


class TestCIRREvaluator:
    def test_end_to_end(self, api):
        names = [f"img{i}" for i in range(N_GALLERY)]
        classic = Loader(make_gallery_items(names), 8, num_workers=0)
        g = np.random.default_rng(13)
        rel_items = []
        for i in range(8):
            members = [names[(i + j) % N_GALLERY] for j in range(6)]
            rel_items.append({
                "ref_name": names[i],
                "tar_name": names[(i + 1) % N_GALLERY],
                "caption": "change the color",
                "group_members": members,
                "ref_patch": g.standard_normal((13, DIM)).astype(np.float32),
            })
        relative = Loader(rel_items, 8, num_workers=0)
        m = E.evaluate_cirr(api, classic, relative)
        for key in ("recall_at1", "recall_at5", "recall_at10", "recall_at50",
                    "group_recall_at1", "group_recall_at2", "group_recall_at3",
                    "headline"):
            assert key in m
        assert m["recall_at50"] == 100.0  # gallery of 20, ref dropped
        assert m["group_recall_at3"] >= m["group_recall_at1"]
        # 5 non-ref members → rank<5 always true at k=5... but group R@3 ≤ 100
        assert 0.0 <= m["group_recall_at1"] <= 100.0


class TestFashion200kEvaluator:
    def test_multipositive(self, api):
        # two images share caption "red dress" → retrieving either is a hit
        captions = ["red dress", "red dress", "blue dress", "green dress",
                    "white shirt", "black shirt"]
        classic = Loader(make_gallery_items(captions), 8, num_workers=0)
        g = np.random.default_rng(14)
        rel_items = [
            {
                "ref_id": "blue dress",
                "tar_id": "red dress",
                "caption": "replace blue with red",
                "ref_patch": g.standard_normal((13, DIM)).astype(np.float32),
            }
        ]
        relative = Loader(rel_items, 8, num_workers=0)
        m = E.evaluate_fashion200k(api, classic, relative)
        assert m["recall_at50"] == 100.0


class TestShoesEvaluator:
    def test_end_to_end(self, api):
        names = [f"shoe{i}" for i in range(10)]
        classic = Loader(make_gallery_items(names), 8, num_workers=0)
        g = np.random.default_rng(15)
        rel_items = [
            {
                "ref_name": names[0],
                "tar_name": names[5],
                "caption": "has higher heels",
                "ref_patch": g.standard_normal((13, DIM)).astype(np.float32),
            }
        ]
        relative = Loader(rel_items, 8, num_workers=0)
        m = E.evaluate_shoes(api, classic, relative)
        assert m["recall_at50"] == 100.0


class TestLastWinsRows:
    def test_duplicates_resolve_last(self):
        rows = E.last_wins_rows(["a", "b", "a", "c"])
        assert rows == {"a": 2, "b": 1, "c": 3}


class TestCIRRSubmission:
    def test_payload_structure(self, api):
        names = [f"img{i}" for i in range(N_GALLERY)]
        classic = Loader(make_gallery_items(names), 8, num_workers=0)
        g = np.random.default_rng(21)
        rel_items = []
        for i in range(5):
            members = [names[(i + j) % N_GALLERY] for j in range(6)]
            rel_items.append({
                "pair_id": 1000 + i,
                "ref_name": names[i],
                "caption": "alter the pattern",
                "group_members": members,
                "ref_patch": g.standard_normal((13, DIM)).astype(np.float32),
            })
        relative = Loader(rel_items, 8, num_workers=0)
        out = E.generate_cirr_submission(api, classic, relative)
        rec = out["recall_submission"]
        sub = out["recall_subset_submission"]
        assert rec["version"] == "rc2" and rec["metric"] == "recall"
        assert sub["metric"] == "recall_subset"
        for i in range(5):
            row = rec[str(1000 + i)]
            # reference image never appears in its own ranking
            assert names[i] not in row
            assert len(row) == min(50, N_GALLERY - 1)
            srow = sub[str(1000 + i)]
            assert len(srow) == 3
            assert names[i] not in srow
            # subset candidates come from the group members
            assert set(srow) <= set(rel_items[i]["group_members"])


@pytest.mark.slow
class TestMeshShardedInference:
    def test_sharded_eval_matches_single_device(self):
        """InferenceAPI(mesh=...) shards batches over the data axis; the
        evaluator results must be identical to the unsharded run."""
        from fashionern_aaai2024_tpu.parallel.mesh import create_mesh

        model = composed.ComposedCIRModel(TINY, patch_num=13)
        k = jax.random.PRNGKey(0)
        g = np.random.default_rng(0)
        variables = model.init(
            {"params": k, "dropout": k},
            g.random((2, 32, 32, 3), dtype=np.float32),
            g.random((2, 32, 32, 3), dtype=np.float32),
            g.integers(0, 100, (2, 16)).astype(np.int32),
            g.standard_normal((2, 13, DIM), dtype=np.float32),
            g.standard_normal((2, 13, DIM), dtype=np.float32),
            deterministic=False, method=model.train_forward,
        )
        plain = E.InferenceAPI(model, variables, batch_size=8,
                               context_length=16, tokenizer=fake_tokenizer)
        sharded = E.InferenceAPI(model, variables, batch_size=8,
                                 context_length=16, tokenizer=fake_tokenizer,
                                 mesh=create_mesh(8))
        names = [f"img{i}" for i in range(N_GALLERY)]
        rel = [
            {
                "ref_name": names[i],
                "tar_name": names[(i + 3) % N_GALLERY],
                "captions": ["is red", "has sleeves"],
                "ref_patch": np.random.default_rng(40 + i)
                .standard_normal((13, DIM)).astype(np.float32),
            }
            for i in range(10)
        ]
        m1 = E.evaluate_fiq_split(plain, Loader(make_gallery_items(names), 8, num_workers=0),
                                  Loader(rel, 8, num_workers=0))
        m2 = E.evaluate_fiq_split(sharded, Loader(make_gallery_items(names), 8, num_workers=0),
                                  Loader(rel, 8, num_workers=0))
        assert m1 == m2

    def test_indivisible_batch_rejected(self):
        from fashionern_aaai2024_tpu.parallel.mesh import create_mesh

        model = composed.ComposedCIRModel(TINY, patch_num=13)
        with pytest.raises(ValueError, match="not divisible"):
            E.InferenceAPI(model, {"params": {}}, batch_size=6,
                           mesh=create_mesh(8))

    def test_sharded_serve_matches_single_device(self, api):
        """build_serve_fn(mesh=...) row-shards the gallery + raw ref
        arrays over the data axis (serving HBM scales with mesh size);
        the one-dispatch answers must match the single-device program.
        Gallery size 21 on an 8-mesh exercises pad rows, the masked
        distributed ref-row gather, and k_local < k_max merging."""
        from fashionern_aaai2024_tpu.parallel.mesh import create_mesh

        g = np.random.default_rng(3)
        n = 21
        gal = g.standard_normal((n, DIM)).astype(np.float32)
        ref_f = g.standard_normal((n, DIM)).astype(np.float32)
        ref_p = g.standard_normal((n, 13, DIM)).astype(np.float32)
        plain = api.build_serve_fn(gal, k_max=7, buckets=(1, 4),
                                   ref_features=ref_f, ref_patches=ref_p)
        sharded = api.build_serve_fn(gal, k_max=7, buckets=(1, 4),
                                     ref_features=ref_f, ref_patches=ref_p,
                                     mesh=create_mesh(8))
        assert sharded.mesh is not None and plain.mesh is None
        ids = fake_tokenizer(["is red", "blue dress", "long sleeves"], 16)
        rows = [0, 5, 20]  # 20: last row — lives on a late shard
        s1, i1 = plain(ids, rows, k=7)
        s2, i2 = sharded(ids, rows, k=7)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, atol=1e-5)
        # padded gallery rows (21→24) must never appear in the top-k
        assert int(np.max(i2)) < n

    def test_sharded_quantized_serve_matches_single_device(self, api):
        """--quantize-gallery + --data-parallel: the int8-scored sharded
        program answers identically to the int8 single-device one."""
        from fashionern_aaai2024_tpu.parallel.mesh import create_mesh

        api_q = E.InferenceAPI(api.model, api.variables, batch_size=8,
                               context_length=16, tokenizer=fake_tokenizer,
                               quantize_gallery=True)
        g = np.random.default_rng(5)
        n = 21
        gal = g.standard_normal((n, DIM)).astype(np.float32)
        ref_f = g.standard_normal((n, DIM)).astype(np.float32)
        ref_p = g.standard_normal((n, 13, DIM)).astype(np.float32)
        plain = api_q.build_serve_fn(gal, k_max=7, buckets=(4,),
                                     ref_features=ref_f, ref_patches=ref_p)
        sharded = api_q.build_serve_fn(gal, k_max=7, buckets=(4,),
                                       ref_features=ref_f, ref_patches=ref_p,
                                       mesh=create_mesh(8))
        ids = fake_tokenizer(["is red", "blue dress"], 16)
        s1, i1 = plain(ids, [0, 20], k=7)
        s2, i2 = sharded(ids, [0, 20], k=7)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, atol=1e-5)

    def test_sharded_serve_fn_not_exportable(self, api):
        """The AOT exporter refuses mesh programs (the serialization
        would pin the device count) with an actionable message."""
        from fashionern_aaai2024_tpu.parallel.mesh import create_mesh
        from fashionern_aaai2024_tpu.retrieval.artifact import (
            export_serve_artifact,
        )

        g = np.random.default_rng(4)
        sharded = api.build_serve_fn(
            g.standard_normal((16, DIM)).astype(np.float32),
            k_max=4, buckets=(1,),
            ref_features=g.standard_normal((16, DIM)).astype(np.float32),
            ref_patches=g.standard_normal((16, 13, DIM)).astype(np.float32),
            mesh=create_mesh(8))
        with pytest.raises(ValueError, match="not exportable"):
            export_serve_artifact(sharded, "/tmp/should_not_exist")


class TestQuantizedServeConsistency:
    def test_fused_path_matches_int8_index(self, api):
        """--quantize-gallery: the one-dispatch serve program scores via
        the same int8 math as RetrievalIndex.search's quantized tier, so
        small-k (fused) and large-k (index fallback) answers agree —
        and the serve path no longer keeps an fp32 score-matrix copy."""
        from fashionern_aaai2024_tpu.retrieval.engine import RetrievalIndex

        api_q = E.InferenceAPI(api.model, api.variables, batch_size=8,
                               context_length=16, tokenizer=fake_tokenizer,
                               quantize_gallery=True)
        g = np.random.default_rng(6)
        n = 16
        gal = g.standard_normal((n, DIM)).astype(np.float32)
        ref_f = g.standard_normal((n, DIM)).astype(np.float32)
        ref_p = g.standard_normal((n, 13, DIM)).astype(np.float32)
        serve = api_q.build_serve_fn(gal, k_max=5, buckets=(4,),
                                     ref_features=ref_f, ref_patches=ref_p)
        ids = fake_tokenizer(["is red", "blue dress"], 16)
        rows = [0, 9]
        s, i = serve(ids, rows, k=5)

        tg, ts = api_q.encode_text(ids)
        pred = api_q.query(ref_f[rows], ref_p[rows], tg, ts)
        index = RetrievalIndex([f"g{j}" for j in range(n)], gal,
                               quantize=True)
        so, io = index.search(pred, k=5)
        np.testing.assert_array_equal(i, io)
        np.testing.assert_allclose(s, so, rtol=1e-5, atol=1e-5)


class TestBf16ServingPath:
    def test_bf16_variables_match_fp32_recalls(self, api):
        """Production serving runs the towers in bf16 (bench.py config);
        the evaluator must produce the same recalls as fp32 on
        well-separated synthetic data."""
        import jax.numpy as jnp

        bf16_vars = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            api.variables,
        )
        api16 = E.InferenceAPI(api.model, bf16_vars, batch_size=8,
                               context_length=16, tokenizer=fake_tokenizer)
        names = [f"img{i}" for i in range(N_GALLERY)]
        g = np.random.default_rng(31)
        rel = [
            {
                "ref_name": names[i],
                "tar_name": names[(i + 2) % N_GALLERY],
                "captions": ["is red", "short"],
                "ref_patch": g.standard_normal((13, DIM)).astype(np.float32),
            }
            for i in range(8)
        ]

        def run(a):
            return E.evaluate_fiq_split(
                a, Loader(make_gallery_items(names), 8, num_workers=0),
                Loader([dict(r) for r in rel], 8, num_workers=0),
            )

        m32, m16 = run(api), run(api16)
        # identical at R@50 (gallery < 50); R@10 may differ by one
        # near-tie under bf16 rounding
        assert m16["recall_at50"] == m32["recall_at50"] == 100.0
        assert abs(m16["recall_at10"] - m32["recall_at10"]) <= 2 * 100.0 / len(rel)


class TestQuantizedRefs:
    """--quantize-refs: int8 reference feature/patch rows (per-row
    scales, dequantized in-program before DVR). The ref-patch array is
    the dominant serving-HBM term (13×d×4 B/item), so this is the ~4×
    memory option; answers must stay close to the fp32-refs program and
    the sharded variant must match the single-device one exactly."""

    def _arrays(self, seed=7, n=21):
        g = np.random.default_rng(seed)
        gal = g.standard_normal((n, DIM)).astype(np.float32)
        ref_f = g.standard_normal((n, DIM)).astype(np.float32)
        ref_p = g.standard_normal((n, 13, DIM)).astype(np.float32)
        return gal, ref_f, ref_p

    def _api_q(self, api):
        return E.InferenceAPI(api.model, api.variables, batch_size=8,
                              context_length=16, tokenizer=fake_tokenizer,
                              quantize_refs=True)

    def test_close_to_fp32_refs(self, api):
        gal, ref_f, ref_p = self._arrays()
        fp = api.build_serve_fn(gal, k_max=7, buckets=(4,),
                                ref_features=ref_f, ref_patches=ref_p)
        q = self._api_q(api).build_serve_fn(
            gal, k_max=7, buckets=(4,), ref_features=ref_f, ref_patches=ref_p)
        ids = fake_tokenizer(["is red", "blue dress", "long"], 16)
        s1, i1 = fp(ids, [0, 5, 20], k=7)
        s2, i2 = q(ids, [0, 5, 20], k=7)
        # int8 refs perturb DVR inputs ~0.4%: top-1 must survive, and
        # the top-7 sets must overlap strongly
        np.testing.assert_array_equal(i1[:, 0], i2[:, 0])
        for r1, r2 in zip(i1, i2):
            assert len(set(r1.tolist()) & set(r2.tolist())) >= 5
        np.testing.assert_allclose(s1, s2, rtol=0, atol=0.05)
        # memory contract: the resident ref arrays really are int8
        _, _, rf, rp = q.consts
        assert np.asarray(rf[0]).dtype == np.int8
        assert np.asarray(rp[0]).dtype == np.int8

    def test_sharded_matches_single_device(self, api):
        from fashionern_aaai2024_tpu.parallel.mesh import create_mesh

        api_q = self._api_q(api)
        gal, ref_f, ref_p = self._arrays(seed=9)
        plain = api_q.build_serve_fn(gal, k_max=7, buckets=(4,),
                                     ref_features=ref_f, ref_patches=ref_p)
        sharded = api_q.build_serve_fn(gal, k_max=7, buckets=(4,),
                                       ref_features=ref_f, ref_patches=ref_p,
                                       mesh=create_mesh(8))
        ids = fake_tokenizer(["is red", "blue dress"], 16)
        s1, i1 = plain(ids, [0, 20], k=7)
        s2, i2 = sharded(ids, [0, 20], k=7)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, atol=1e-4)

    def test_export_roundtrip(self, api, tmp_path):
        """The quantized-refs consts tuple (nested (values, scales)
        pairs) must survive the AOT export → reload cycle."""
        from fashionern_aaai2024_tpu.retrieval.artifact import (
            export_serve_artifact, load_serve_artifact)

        gal, ref_f, ref_p = self._arrays(seed=11)
        q = self._api_q(api).build_serve_fn(
            gal, k_max=5, buckets=(2,), ref_features=ref_f, ref_patches=ref_p)
        names = [f"img{i}" for i in range(gal.shape[0])]
        export_serve_artifact(q, str(tmp_path / "art"), gallery_names=names)
        loaded = load_serve_artifact(str(tmp_path / "art"))
        ids = fake_tokenizer(["is red", "blue"], 16)
        s1, i1 = q(ids, [0, 20], k=5)
        s2, i2 = loaded.query(ids, [0, 20], k=5)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, atol=1e-5)


class TestGrowableServe:
    """capacity=: live-growable serve program. Contract: a grown/updated
    program answers EXACTLY like a fresh capacity-None program built
    over the same (extended) arrays — padding rows and the dynamic
    n_valid mask must be invisible."""

    def _arrays(self, seed, n):
        g = np.random.default_rng(seed)
        return (g.standard_normal((n, DIM)).astype(np.float32),
                g.standard_normal((n, DIM)).astype(np.float32),
                g.standard_normal((n, 13, DIM)).astype(np.float32))

    def _build(self, api, gal, rf, rp, **kw):
        return api.build_serve_fn(gal, k_max=7, buckets=(4,),
                                  ref_features=rf, ref_patches=rp, **kw)

    def test_padding_is_invisible(self, api):
        gal, rf, rp = self._arrays(21, 15)
        fixed = self._build(api, gal, rf, rp)
        grow = self._build(api, gal, rf, rp, capacity=40)
        assert grow.growable and grow.n_valid() == 15
        ids = fake_tokenizer(["is red", "long dress"], 16)
        s1, i1 = fixed(ids, [0, 14], k=7)
        s2, i2 = grow(ids, [0, 14], k=7)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, atol=1e-5)

    def test_append_matches_rebuild(self, api):
        gal, rf, rp = self._arrays(22, 15)
        grow = self._build(api, gal, rf, rp, capacity=40)
        gal2, rf2, rp2 = self._arrays(23, 6)
        assert grow.update_rows(15, gal2, rf2, rp2) == 21
        rebuilt = self._build(api, np.concatenate([gal, gal2]),
                              np.concatenate([rf, rf2]),
                              np.concatenate([rp, rp2]))
        ids = fake_tokenizer(["is red", "blue shirt", "short"], 16)
        rows = [0, 17, 20]  # refs include two ADDED rows
        s1, i1 = grow(ids, rows, k=7)
        s2, i2 = rebuilt(ids, rows, k=7)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, atol=1e-5)
        # added rows are reachable as results too
        assert (np.asarray(i1) >= 15).any()

    def test_overwrite_matches_rebuild(self, api):
        gal, rf, rp = self._arrays(24, 12)
        grow = self._build(api, gal, rf, rp, capacity=20)
        g1, f1, p1 = self._arrays(25, 3)
        assert grow.update_rows(4, g1, f1, p1) == 12  # overwrite keeps count
        gal[4:7], rf[4:7], rp[4:7] = g1, f1, p1
        rebuilt = self._build(api, gal, rf, rp)
        ids = fake_tokenizer(["is red"], 16)
        s1, i1 = grow(ids, [5], k=7)
        s2, i2 = rebuilt(ids, [5], k=7)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, atol=1e-5)

    def test_approx_growable_matches_rebuild(self, api):
        """approx_recall composes with the growable program: the
        dynamic n_valid mask applies before the approx selector (on CPU
        approx is the exact sort, so equality is bit-for-bit)."""
        a = E.InferenceAPI(api.model, api.variables, batch_size=8,
                           context_length=16, tokenizer=fake_tokenizer,
                           approx_recall=0.95)
        gal, rf, rp = self._arrays(31, 15)
        grow = self._build(a, gal, rf, rp, capacity=40)
        g2, f2, p2 = self._arrays(32, 5)
        assert grow.update_rows(15, g2, f2, p2) == 20
        rebuilt = self._build(a, np.concatenate([gal, g2]),
                              np.concatenate([rf, f2]),
                              np.concatenate([rp, p2]))
        ids = fake_tokenizer(["is red", "long dress"], 16)
        s1, i1 = grow(ids, [0, 18], k=7)
        s2, i2 = rebuilt(ids, [0, 18], k=7)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, atol=1e-5)
        assert int(np.max(i1)) < 20  # capacity pad rows never surface

    @pytest.mark.parametrize("flag", ["quantize_gallery", "quantize_refs"])
    def test_quantized_combos_match_rebuild(self, api, flag):
        api_q = E.InferenceAPI(api.model, api.variables, batch_size=8,
                               context_length=16, tokenizer=fake_tokenizer,
                               **{flag: True})
        gal, rf, rp = self._arrays(26, 10)
        grow = self._build(api_q, gal, rf, rp, capacity=30)
        g1, f1, p1 = self._arrays(27, 5)
        grow.update_rows(10, g1, f1, p1)
        rebuilt = self._build(api_q, np.concatenate([gal, g1]),
                              np.concatenate([rf, f1]),
                              np.concatenate([rp, p1]))
        ids = fake_tokenizer(["is red", "short"], 16)
        s1, i1 = grow(ids, [2, 12], k=7)
        s2, i2 = rebuilt(ids, [2, 12], k=7)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, atol=1e-4)

    def test_errors(self, api):
        gal, rf, rp = self._arrays(28, 10)
        with pytest.raises(ValueError, match="capacity 5 < current"):
            self._build(api, gal, rf, rp, capacity=5)
        grow = self._build(api, gal, rf, rp, capacity=12)
        g1, f1, p1 = self._arrays(29, 5)
        with pytest.raises(ValueError, match="exceeds capacity"):
            grow.update_rows(10, g1, f1, p1)
        fixed = self._build(api, gal, rf, rp)
        with pytest.raises(ValueError, match="without capacity"):
            fixed.update_rows(10, g1, f1, p1)
        from fashionern_aaai2024_tpu.retrieval.artifact import (
            export_serve_artifact)
        with pytest.raises(ValueError, match="growable"):
            export_serve_artifact(grow, "/tmp/nope")
        from fashionern_aaai2024_tpu.parallel.mesh import create_mesh
        with pytest.raises(ValueError, match="single-device"):
            self._build(api, gal, rf, rp, capacity=20, mesh=create_mesh(8))


class TestApproxTopK:
    """`approx_recall` tier: on CPU `lax.approx_max_k` lowers to the
    exact sort with identical tie-breaking, so every approx-tier path
    is pinned bit-for-bit against its exact twin here; the TPU
    speed/recall ladder is measured in benchmarks/topk_probe.py and
    recorded in ops/similarity.py."""

    def _api_approx(self, api):
        a = E.InferenceAPI(api.model, api.variables, batch_size=8,
                           context_length=16, tokenizer=fake_tokenizer,
                           approx_recall=0.95)
        return a

    def test_serve_fn_matches_exact(self, api):
        g = np.random.default_rng(11)
        n = 21
        gal = g.standard_normal((n, DIM)).astype(np.float32)
        rf = g.standard_normal((n, DIM)).astype(np.float32)
        rp = g.standard_normal((n, 13, DIM)).astype(np.float32)
        exact = api.build_serve_fn(gal, k_max=7, buckets=(4,),
                                   ref_features=rf, ref_patches=rp)
        approx = self._api_approx(api).build_serve_fn(
            gal, k_max=7, buckets=(4,), ref_features=rf, ref_patches=rp)
        ids = fake_tokenizer(["is red", "blue dress"], 16)
        s1, i1 = exact(ids, [0, n - 1], k=7)
        s2, i2 = approx(ids, [0, n - 1], k=7)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, atol=1e-6)

    def test_sharded_serve_fn_matches_exact(self, api):
        from fashionern_aaai2024_tpu.parallel.mesh import create_mesh

        g = np.random.default_rng(12)
        n = 21
        gal = g.standard_normal((n, DIM)).astype(np.float32)
        rf = g.standard_normal((n, DIM)).astype(np.float32)
        rp = g.standard_normal((n, 13, DIM)).astype(np.float32)
        api_a = self._api_approx(api)
        plain = api_a.build_serve_fn(gal, k_max=7, buckets=(4,),
                                     ref_features=rf, ref_patches=rp)
        sharded = api_a.build_serve_fn(gal, k_max=7, buckets=(4,),
                                       ref_features=rf, ref_patches=rp,
                                       mesh=create_mesh(8))
        ids = fake_tokenizer(["is red", "blue dress"], 16)
        s1, i1 = plain(ids, [0, n - 1], k=7)
        s2, i2 = sharded(ids, [0, n - 1], k=7)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, atol=1e-5)
        assert int(np.max(i2)) < n  # pad rows never surface

    def test_eval_pipeline_matches_exact(self, api):
        names = [f"img{i}" for i in range(N_GALLERY)]
        gal_items = make_gallery_items(names)
        g = np.random.default_rng(13)
        rel_items = [
            {"ref_name": names[i], "tar_name": names[(i + 3) % N_GALLERY],
             "captions": ["is red", "has sleeves"],
             "ref_patch": g.standard_normal((13, DIM)).astype(np.float32)}
            for i in range(10)
        ]
        run = lambda a: E.evaluate_fiq_split(
            a, Loader(gal_items, 8, num_workers=0),
            Loader(rel_items, 8, num_workers=0), ks=(1, 5))
        assert run(self._api_approx(api)) == run(api)
