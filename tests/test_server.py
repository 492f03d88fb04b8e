"""`fashionern serve`: gallery-resident retrieval service over HTTP.

Drives the real service end-to-end on the CPU backend: tiny composed
model, synthetic fixture gallery, ephemeral-port ThreadingHTTPServer,
JSON round trips — and pins the service's rankings to the offline
eval-path rankings for the same weights."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from fashionern_aaai2024_tpu.models import composed
from fashionern_aaai2024_tpu.models.clip import config as clip_config
from fashionern_aaai2024_tpu.retrieval import evaluate as E
from fashionern_aaai2024_tpu.retrieval.server import RetrievalService, serve
from fashionern_aaai2024_tpu.data.loader import Loader

D, CTX = 24, 16

TINY = clip_config.CLIPConfig(
    name="vit-test",
    vision=clip_config.VisionConfig(
        kind="vit", image_size=32, embed_dim=D, width=64, layers=2, heads=4,
        patch_size=16,
    ),
    text=clip_config.TextConfig(
        vocab_size=100, context_length=CTX, width=32, heads=4, layers=2,
        embed_dim=D,
    ),
)


def fake_tokenizer(texts, context_length=CTX):
    out = np.zeros((len(texts), context_length), np.int32)
    for i, t in enumerate(texts):
        h = [hash(w) % 97 + 1 for w in t.split()][:context_length]
        out[i, : len(h)] = h
    return out


@pytest.fixture(scope="module")
def service():
    import jax

    model = composed.ComposedCIRModel(TINY, patch_num=13)
    rng = jax.random.PRNGKey(0)
    v = TINY.vision
    variables = model.init(
        {"params": rng, "dropout": rng},
        np.zeros((2, v.image_size, v.image_size, 3), np.float32),
        np.zeros((2, v.image_size, v.image_size, 3), np.float32),
        np.zeros((2, CTX), np.int32),
        np.zeros((2, 13, D), np.float32),
        np.zeros((2, 13, D), np.float32),
        deterministic=False, method=model.train_forward,
    )
    api = E.InferenceAPI(model, variables, batch_size=8, context_length=CTX,
                         tokenizer=fake_tokenizer)
    g = np.random.default_rng(1)
    items = [
        {"name": f"img{i}", "image": g.random((32, 32, 3), dtype=np.float32),
         "patch": g.standard_normal((13, D)).astype(np.float32)}
        for i in range(12)
    ]
    return RetrievalService(api, Loader(items, 8, num_workers=0))


@pytest.fixture(scope="module")
def base_url(service):
    httpd = serve(service, port=0)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


class TestRetrievalService:
    def test_query_matches_offline_eval_ranking(self, service):
        """The service's top-k equals the offline eval path (same
        weights, same gallery, same query)."""
        results, _ = service.query(["img3"], ["make it red"], k=12)
        ref_rows = np.asarray([service.rows["img3"]])
        ids = service.api.tokenize(["make it red"])
        tg, tseq = service.api.encode_text(ids)
        preds = service.api.query(
            service.gallery.features[ref_rows],
            service.gallery.local_features[ref_rows], tg, tseq)
        _, idx = service.index.search(preds, k=12)
        want = [service.gallery.names[j] for j in idx[0]]
        assert [r["name"] for r in results[0]] == want

    def test_batch_and_scores_sorted(self, service):
        results, _ = service.query(["img0", "img5"],
                                   ["longer sleeves", "in blue"], k=5)
        assert len(results) == 2
        for res in results:
            scores = [r["score"] for r in res]
            assert scores == sorted(scores, reverse=True)

    def test_unknown_ref_raises(self, service):
        with pytest.raises(KeyError):
            service.query(["nope"], ["x"], k=3)


class TestHTTP:
    def test_healthz(self, base_url):
        with urllib.request.urlopen(f"{base_url}/healthz") as r:
            data = json.loads(r.read())
        assert data == {"status": "ok", "gallery_size": 12}

    def test_query_roundtrip(self, base_url):
        data = _post(f"{base_url}/query",
                     {"ref_name": "img2", "caption": "with a belt", "k": 4})
        assert len(data["results"]) == 4
        assert {"name", "score"} <= set(data["results"][0])
        assert data["latency_ms"] >= 0

    def test_batch_roundtrip(self, base_url):
        data = _post(f"{base_url}/query",
                     {"ref_names": ["img1", "img2"],
                      "captions": ["a", "b"], "k": 3})
        assert len(data["results"]) == 2 and len(data["results"][0]) == 3

    def test_unknown_ref_404(self, base_url):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"{base_url}/query", {"ref_name": "ghost", "caption": "x"})
        assert e.value.code == 404

    def test_bad_request_400(self, base_url):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"{base_url}/query", {"caption": "missing ref"})
        assert e.value.code == 400

    def test_stats(self, base_url):
        _post(f"{base_url}/query", {"ref_name": "img0", "caption": "y"})
        with urllib.request.urlopen(f"{base_url}/stats") as r:
            data = json.loads(r.read())
        assert data["requests"] >= 1
        assert data["gallery_size"] == 12
        assert data["latency_ms"]["p50"] is not None

    def test_batch_with_stray_ref_name_stays_batch(self, base_url):
        """A request with BOTH ref_names and a stray ref_name key runs
        the batch query; the response shape must key on the same
        condition (ADVICE r2: it used to unwrap results[0])."""
        data = _post(f"{base_url}/query",
                     {"ref_names": ["img1", "img2"], "ref_name": "img1",
                      "captions": ["a", "b"], "k": 3})
        assert len(data["results"]) == 2 and len(data["results"][0]) == 3


class TestServeFn:
    def test_buckets_consistent_and_match_search(self, service):
        """The fused one-dispatch serve program returns the same top-k
        at every compile bucket, and matches the blocked-search path."""
        import numpy as np

        api = service.api
        fn = service._serve_fn
        assert fn.by_rows  # service serve path gathers refs on-device
        ids = api.tokenize(["with a belt", "longer and red", "plain"])
        rows = np.asarray([2, 5, 7])
        rf = service.gallery.features[rows]
        rp = service.gallery.local_features[rows]
        s3, i3 = fn(ids, rows, k=5)          # bucket 8
        s1, i1 = fn(ids[:1], rows[:1], k=5)  # bucket 1
        np.testing.assert_array_equal(i3[:1], i1)
        np.testing.assert_allclose(s3[:1], s1, atol=1e-5)
        # vs the multi-dispatch eval path
        tg, ts = api.encode_text(ids)
        preds = api.query(rf, rp, tg, ts)
        sw, iw = service.index.search(preds, k=5)
        np.testing.assert_array_equal(i3, iw)
        np.testing.assert_allclose(s3, sw, atol=1e-4)

    def test_large_k_falls_back(self, service):
        out, _ = service.query(["img1"], ["anything bigger"],
                               k=service._serve_fn.k_max + 10)
        # gallery_size caps k; just verify the fallback executes
        assert len(out[0]) == service.gallery_size


class TestMicroBatcher:
    def test_concurrent_singles_coalesce_and_stay_correct(self, service):
        """N concurrent b=1 HTTP-style queries through the MicroBatcher
        return exactly what the direct path returns, and coalesce into
        fewer dispatches than N."""
        import concurrent.futures as futures

        from fashionern_aaai2024_tpu.retrieval.server import MicroBatcher

        b = MicroBatcher(service, max_batch=8, max_wait_ms=30.0)
        try:
            reqs = [(f"img{i % 12}", f"caption {i} words", 3)
                    for i in range(16)]
            with futures.ThreadPoolExecutor(16) as pool:
                got = list(pool.map(lambda r: b.submit(*r)[0], reqs))
            for (ref, cap, k), res in zip(reqs, got):
                want, _ = service.query([ref], [cap], k=k)
                assert [x["name"] for x in res] == \
                    [x["name"] for x in want[0]]
                assert len(res) == k
            assert b.batches_run < 16  # coalescing actually happened
            assert b.items_run == 16
        finally:
            b.close()

    def test_unknown_ref_fails_fast_without_poisoning(self, service):
        from fashionern_aaai2024_tpu.retrieval.server import MicroBatcher

        b = MicroBatcher(service, max_batch=4, max_wait_ms=5.0)
        try:
            with pytest.raises(KeyError):
                b.submit("ghost", "x", 3)
            res, _ = b.submit("img1", "still works", 2)
            assert len(res) == 2
        finally:
            b.close()

    def test_http_singles_share_batches(self, base_url):
        """Concurrent HTTP b=1 posts all succeed under the batcher and
        /stats reports the coalescing."""
        import concurrent.futures as futures
        import json as _json
        import urllib.request

        def post_one(i):
            return _post(f"{base_url}/query",
                         {"ref_name": f"img{i % 12}",
                          "caption": f"belted {i}", "k": 2})

        with futures.ThreadPoolExecutor(8) as pool:
            outs = list(pool.map(post_one, range(8)))
        assert all(len(o["results"]) == 2 for o in outs)
        with urllib.request.urlopen(f"{base_url}/stats") as r:
            stats = _json.loads(r.read())
        assert "dynamic_batching" in stats
        assert stats["dynamic_batching"]["items"] >= 8


class TestLiveAdds:
    """serve --capacity: add_items / POST /add grow a running service
    with zero recompiles; answers must match a service rebuilt from
    scratch over the extended gallery."""

    def _make_service(self, capacity=None, items=None, **svc_kw):
        import jax

        model = composed.ComposedCIRModel(TINY, patch_num=13)
        rng = jax.random.PRNGKey(0)
        v = TINY.vision
        variables = model.init(
            {"params": rng, "dropout": rng},
            np.zeros((2, v.image_size, v.image_size, 3), np.float32),
            np.zeros((2, v.image_size, v.image_size, 3), np.float32),
            np.zeros((2, CTX), np.int32),
            np.zeros((2, 13, D), np.float32),
            np.zeros((2, 13, D), np.float32),
            deterministic=False, method=model.train_forward,
        )
        api = E.InferenceAPI(model, variables, batch_size=8,
                             context_length=CTX, tokenizer=fake_tokenizer)
        return RetrievalService(api, Loader(items, 8, num_workers=0),
                                capacity=capacity, warmup=False, **svc_kw)

    def _items(self, seed, n, prefix="img"):
        g = np.random.default_rng(seed)
        return [
            {"name": f"{prefix}{i}",
             "image": g.random((32, 32, 3), dtype=np.float32),
             "patch": g.standard_normal((13, D)).astype(np.float32)}
            for i in range(n)
        ]

    def test_add_items_matches_rebuild(self):
        base = self._items(1, 12)
        new = self._items(2, 3, prefix="new")
        svc = self._make_service(capacity=20, items=base)
        out = svc.add_items([it["name"] for it in new],
                            np.stack([it["image"] for it in new]),
                            np.stack([it["patch"] for it in new]))
        assert out["added"] == 3 and out["gallery_size"] == 15
        assert svc.gallery_size == 15
        # new items answer as references AND can be retrieved
        res, _ = svc.query(["new1", "img0"], ["is red", "short"], k=15)
        names_seen = {r["name"] for r in res[0]} | {r["name"] for r in res[1]}
        assert {"new0", "new1", "new2"} & names_seen
        rebuilt = self._make_service(items=base + new)
        res2, _ = rebuilt.query(["new1", "img0"], ["is red", "short"], k=15)
        for a, b in zip(res, res2):
            assert [x["name"] for x in a] == [x["name"] for x in b]
        # large-k fallback path (k > k_max) uses the rebuilt index
        big1, _ = svc.query(["new0"], ["is red"], k=14)
        big2, _ = rebuilt.query(["new0"], ["is red"], k=14)
        assert [x["name"] for x in big1[0]] == [x["name"] for x in big2[0]]

    def test_add_requires_capacity(self):
        svc = self._make_service(items=self._items(3, 6))
        new = self._items(4, 1)
        with pytest.raises(ValueError, match="capacity"):
            svc.add_items([new[0]["name"]],
                          np.stack([new[0]["image"]]),
                          np.stack([new[0]["patch"]]))

    def test_add_from_paths_http(self, tmp_path):
        """End to end over HTTP: write a JPEG + patch .npy to disk,
        POST /add, then query the new item."""
        import json as _json
        import threading as _threading
        import urllib.request
        from PIL import Image

        svc = self._make_service(
            capacity=16, items=self._items(5, 8),
            image_spec=dict(dim=32, pad_mode="target", target_ratio=1.25),
            add_root=str(tmp_path))
        httpd = serve(svc, port=0, dynamic_batching=False)
        t = _threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{httpd.server_address[1]}"
            g = np.random.default_rng(9)
            img = (g.random((48, 40, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(tmp_path / "fresh.jpg", quality=90)
            np.save(tmp_path / "fresh.npy",
                    g.standard_normal((13, D)).astype(np.float32))
            body = _json.dumps({"items": [{
                "name": "fresh",
                "image_path": str(tmp_path / "fresh.jpg"),
                "patch_path": str(tmp_path / "fresh.npy"),
            }]}).encode()
            req = urllib.request.Request(f"{url}/add", data=body,
                                         method="POST")
            with urllib.request.urlopen(req) as r:
                out = _json.loads(r.read())
            assert out["gallery_size"] == 9
            q = _json.dumps({"ref_name": "fresh", "caption": "is red",
                             "k": 3}).encode()
            req = urllib.request.Request(f"{url}/query", data=q,
                                         method="POST")
            with urllib.request.urlopen(req) as r:
                res = _json.loads(r.read())
            assert len(res["results"]) == 3
        finally:
            httpd.shutdown()

    def test_re_add_replaces_in_place(self):
        """Re-adding an existing name must REPLACE its row, not append
        a duplicate that would shadow results."""
        base = self._items(6, 10)
        svc = self._make_service(capacity=16, items=base)
        # replacement content for img3 + one genuinely new item
        repl = self._items(7, 2, prefix="x")
        out = svc.add_items(["img3", "x0"],
                            np.stack([it["image"] for it in repl]),
                            np.stack([it["patch"] for it in repl]))
        assert out == {**out, "added": 1, "replaced": 1, "gallery_size": 11}
        # rebuild oracle: same gallery with img3's content swapped
        base2 = [dict(it) for it in base]
        base2[3] = {"name": "img3", "image": repl[0]["image"],
                    "patch": repl[0]["patch"]}
        rebuilt = self._make_service(items=base2 + [
            {"name": "x0", "image": repl[1]["image"],
             "patch": repl[1]["patch"]}])
        r1, _ = svc.query(["img3", "x0"], ["is red", "short"], k=11)
        r2, _ = rebuilt.query(["img3", "x0"], ["is red", "short"], k=11)
        for a, b in zip(r1, r2):
            assert [x["name"] for x in a] == [x["name"] for x in b]
        # no duplicate names in any result row
        for row in r1:
            ns = [x["name"] for x in row]
            assert len(ns) == len(set(ns))
