"""CLI tests: parser surface, info, and an end-to-end `eval` + `train`
run over a synthetic on-disk FashionIQ tree with a tiny injected
backbone config."""

import gzip
import json
import os
import types

import jax
import numpy as np
import pytest
from PIL import Image

from fashionern_aaai2024_tpu.cli.main import (
    build_parser,
    run_eval,
    run_info,
    run_train,
)
from fashionern_aaai2024_tpu.models.clip import config as clip_config

DIM, FD, PD = 32, 24, 13

TINY = clip_config.CLIPConfig(
    name="tiny-test",
    vision=clip_config.VisionConfig(
        kind="vit", image_size=DIM, embed_dim=FD, width=64, layers=2, heads=4,
        patch_size=16,
    ),
    text=clip_config.TextConfig(
        vocab_size=600, context_length=16, width=32, heads=4, layers=2, embed_dim=FD
    ),
)


@pytest.fixture()
def tiny_backbone(monkeypatch):
    monkeypatch.setitem(clip_config._CONFIGS, "tiny-test", TINY)
    return "tiny-test"


@pytest.fixture()
def bpe_file(tmp_path, monkeypatch):
    """Minimal real merges table so the production tokenizer path runs."""
    p = tmp_path / "bpe.txt.gz"
    with gzip.open(p, "wt") as f:
        f.write("#version\nl o\nlo w</w>\nr e\nre d</w>\n")
    monkeypatch.setenv("FASHIONERN_BPE_PATH", str(p))
    # the default tokenizer is lru-cached per process; drop it
    from fashionern_aaai2024_tpu.models.clip import tokenizer as tok

    tok._default_tokenizer.cache_clear()
    yield str(p)
    tok._default_tokenizer.cache_clear()


@pytest.fixture()
def fiq_root(tmp_path):
    root = tmp_path / "fiq"
    g = np.random.default_rng(0)
    names = [f"img{i}" for i in range(8)]
    os.makedirs(root / "images")
    os.makedirs(root / "fashion_local13")
    for n in names:
        Image.fromarray((g.random((40, 30, 3)) * 255).astype(np.uint8)).save(
            root / "images" / f"{n}.png"
        )
        np.save(root / "fashion_local13" / f"{n}.npy",
                g.standard_normal((PD, FD)).astype(np.float32))
    triplets = [
        {"candidate": names[i], "target": names[(i + 1) % 8],
         "captions": ["is red", "low red"]}
        for i in range(6)
    ]
    os.makedirs(root / "captions")
    os.makedirs(root / "image_splits")
    for split in ("train", "val"):
        for dt in ("dress", "shirt", "toptee"):
            (root / "captions" / f"cap.{dt}.{split}.json").write_text(
                json.dumps(triplets))
            (root / "image_splits" / f"split.{dt}.{split}.json").write_text(
                json.dumps(names))
    return str(root)


class TestParser:
    def test_eval_flags_mirror_reference(self):
        p = build_parser()
        a = p.parse_args([
            "eval", "--data-root", "/x", "--dataset", "cirr",
            "--clip-model-name", "RN50x4", "--target-ratio", "1.25",
            "--batch-size", "32", "--patch-num", "13",
        ])
        assert a.command == "eval" and a.dataset == "cirr"

    def test_train_defaults_match_reference(self):
        a = build_parser().parse_args(["train", "--data-root", "/x"])
        assert a.lr == 4e-5 and a.batch_size == 1024 and a.num_epochs == 300
        assert a.validation_frequency == 3 and a.clip_model_name == "RN50x4"

    def test_unknown_dataset_rejected(self):
        with pytest.raises(SystemExit):
            build_parser().parse_args(["eval", "--data-root", "/x",
                                       "--dataset", "imagenet"])

    def test_info(self):
        info = run_info()
        assert "ViT-B-16" in info["backbones"] and "RN50x4" in info["backbones"]
        assert set(info["datasets"]) == {"cirr", "fashion200k", "fashioniq", "shoes"}
        assert "bbc" in info["losses"]


class TestEvalEndToEnd:
    @pytest.mark.slow
    def test_fiq_eval(self, fiq_root, tiny_backbone, bpe_file):
        args = types.SimpleNamespace(
            dataset="fashioniq", data_root=fiq_root, clip_model_name=tiny_backbone,
            patch_num=PD, num_workers=0, target_ratio=1.25, transform="targetpad",
            bpe_path=None, clip_path=None, fusion_model_path=None, batch_size=4,
            split="val", json=True,
        )
        m = run_eval(args)
        assert set(m) >= {"dress", "shirt", "toptee", "avg"}
        assert 0.0 <= m["avg"] <= 100.0
        # 8-image gallery → R@50 ≡ 100
        assert m["mean_recall_at50"] == 100.0

    @pytest.mark.slow
    def test_fiq_val_protocol(self, fiq_root, tiny_backbone, bpe_file):
        args = types.SimpleNamespace(
            dataset="fashioniq-val", data_root=fiq_root, clip_model_name=tiny_backbone,
            patch_num=PD, num_workers=0, target_ratio=1.25, transform="targetpad",
            bpe_path=None, clip_path=None, fusion_model_path=None, batch_size=4,
            split="val", json=True,
        )
        m = run_eval(args)
        assert set(m["dress"]) == {f"recall_at{k}" for k in (1, 5, 10, 15, 20, 30, 40, 50)} | {"avg"}


@pytest.mark.slow
class TestTrainEndToEnd:
    def test_one_epoch(self, fiq_root, tiny_backbone, bpe_file, tmp_path):
        args = types.SimpleNamespace(
            dataset="fashioniq", data_root=fiq_root, clip_model_name=tiny_backbone,
            patch_num=PD, num_workers=0, target_ratio=1.25, transform="targetpad",
            bpe_path=None, lr=1e-3, batch_size=1, num_epochs=1,
            validation_frequency=10, print_frequency=100, validation_bs=4,
            clip_model_path=None, ckpt_dir=str(tmp_path / "ckpt"), seed=42,
            negatives="local", log_path=None, max_steps_per_epoch=2,
            resume=None, profile_dir=None, precision="fp32",
        )
        run_train(args)
        assert os.path.exists(tmp_path / "ckpt" / "fashioniq-resume")


@pytest.mark.slow
class TestSeedSidecar:
    """The init-seed sidecar (r4 defect fix, VERDICT r4 #2/#3): with
    random-init CLIP towers (fixture/test world, no --clip-model-path)
    the frozen towers are a pure function of the init seed, so eval must
    rebuild them from the SAME seed training used. The BestCheckpointer
    writes `init_seed` to `<best>.meta.json`; `load_model_variables`
    resolves explicit seed > sidecar > 42. The original defect: eval
    re-initialized towers from seed 42 while training used another seed,
    returning noise-level recalls from a perfectly trained fusion."""

    def _train(self, fiq_root, tiny_backbone, tmp_path, seed):
        args = types.SimpleNamespace(
            dataset="fashioniq", data_root=fiq_root, clip_model_name=tiny_backbone,
            patch_num=PD, num_workers=0, target_ratio=1.25, transform="targetpad",
            bpe_path=None, lr=1e-3, batch_size=1, num_epochs=1,
            validation_frequency=1, print_frequency=100, validation_bs=4,
            clip_model_path=None, ckpt_dir=str(tmp_path / "ckpt"), seed=seed,
            negatives="local", log_path=None, max_steps_per_epoch=2,
            resume=None, profile_dir=None, precision="fp32",
        )
        run_train(args)
        return str(tmp_path / "ckpt" / "fashioniq-best")

    @staticmethod
    def _leaves(tree):
        return jax.tree_util.tree_leaves(tree)

    @staticmethod
    def _trees_equal(a, b):
        la, lb = (jax.tree_util.tree_leaves(t) for t in (a, b))
        return len(la) == len(lb) and all(
            np.array_equal(np.asarray(x), np.asarray(y))
            for x, y in zip(la, lb))

    def test_sidecar_restores_training_towers(self, fiq_root, tiny_backbone,
                                              bpe_file, tmp_path):
        from fashionern_aaai2024_tpu.cli.main import load_model_variables

        best = self._train(fiq_root, tiny_backbone, tmp_path, seed=7)
        meta = json.loads(open(best + ".meta.json").read())
        assert meta["init_seed"] == 7
        assert meta["clip_from_checkpoint"] is False

        # no explicit seed → sidecar seed 7 reconstructs the EXACT
        # frozen towers training ran against
        _, v_auto = load_model_variables(TINY, None, best, PD)
        _, v7 = load_model_variables(TINY, None, None, PD, seed=7)
        _, v42 = load_model_variables(TINY, None, None, PD, seed=42)
        assert self._trees_equal(v_auto["params"]["clip"], v7["params"]["clip"])
        # the defect regression: the old default (seed 42) gives
        # DIFFERENT towers — evaluating the trained fusion against them
        # was the r4 accuracy-soak failure
        assert not self._trees_equal(v_auto["params"]["clip"],
                                     v42["params"]["clip"])
        # explicit seed still overrides the sidecar (documented order)
        _, v_override = load_model_variables(TINY, None, best, PD, seed=42)
        assert self._trees_equal(v_override["params"]["clip"],
                                 v42["params"]["clip"])
        # and the fusion subtree comes from the checkpoint either way
        assert self._trees_equal(v_auto["params"]["ern"],
                                 v_override["params"]["ern"])

    def test_clip_from_checkpoint_warns_without_clip_path(
            self, fiq_root, tiny_backbone, bpe_file, tmp_path):
        import warnings

        from fashionern_aaai2024_tpu.cli.main import load_model_variables

        best = self._train(fiq_root, tiny_backbone, tmp_path, seed=7)
        meta_path = best + ".meta.json"
        meta = json.loads(open(meta_path).read())
        meta["clip_from_checkpoint"] = True
        with open(meta_path, "w") as f:
            json.dump(meta, f)
        with pytest.warns(UserWarning, match="random-init towers"):
            load_model_variables(TINY, None, best, PD)
        # with an explicit seed AND no sidecar hazard there is no warning
        os.remove(meta_path)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            load_model_variables(TINY, None, best, PD, seed=7)


class TestRunMirrors:
    def test_all_ten_entry_points_exist(self):
        import importlib

        for name in ("train_fiq", "train_cirr", "train_shoes", "train_200k",
                      "test_fiq", "test_val", "test_cirr", "test_shoes",
                      "test_200k"):
            mod = importlib.import_module(f"fashionern_aaai2024_tpu.run.{name}")
            assert hasattr(mod, "sys")

    def test_mirror_forwards_dataset_preset(self, fiq_root, tiny_backbone, bpe_file,
                                            monkeypatch, capsys):
        from fashionern_aaai2024_tpu.run import _run

        monkeypatch.setattr("sys.argv", [
            "test_fiq", "--data-root", fiq_root, "--clip-model-name", tiny_backbone,
            "--batch-size", "4", "--num-workers", "0", "--json",
        ])
        assert _run("eval", "fashioniq") == 0
        out = capsys.readouterr().out
        assert '"mean_recall_at50": 100.0' in out


class TestServeCLI:
    def test_build_service_and_http(self, fiq_root, tiny_backbone, bpe_file):
        """The serve-CLI wiring end-to-end: dataset -> gallery embed ->
        service -> HTTP query on an ephemeral port."""
        import json as _json
        import threading
        import urllib.request
        from types import SimpleNamespace

        from fashionern_aaai2024_tpu.cli.main import build_service
        from fashionern_aaai2024_tpu.retrieval.server import serve

        args = SimpleNamespace(
            dataset="fashioniq", data_root=fiq_root,
            clip_model_name=tiny_backbone, patch_num=13, num_workers=0,
            target_ratio=1.25, transform="targetpad", bpe_path=bpe_file,
            clip_path=None, fusion_model_path=None, batch_size=8,
            split="val", quantize_towers=False, quantize_gallery=False,
            data_parallel=False,
        )
        service = build_service(args)
        assert service.gallery_size > 0
        httpd = serve(service, port=0)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            port = httpd.server_address[1]
            ref = service.gallery.names[0]
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/query",
                data=_json.dumps({"ref_name": ref, "caption": "low red",
                                  "k": 2}).encode(),
                headers={"Content-Type": "application/json"}, method="POST")
            with urllib.request.urlopen(req) as r:
                data = _json.loads(r.read())
            assert len(data["results"]) == 2
        finally:
            httpd.shutdown()


class TestExportArtifact:
    def test_roundtrip_matches_live_service(self, fiq_root, tiny_backbone,
                                            bpe_file, tmp_path):
        """`fashionern export` → load_serve_artifact: the AOT program
        (weights + gallery as StableHLO constants) answers the same
        query with the same rows/scores as the live service — without
        touching the model stack at load time."""
        from types import SimpleNamespace

        from fashionern_aaai2024_tpu.cli.main import build_service, run_export
        from fashionern_aaai2024_tpu.retrieval.artifact import (
            load_serve_artifact,
        )

        out = str(tmp_path / "artifact")
        args = SimpleNamespace(
            dataset="fashioniq", data_root=fiq_root,
            clip_model_name=tiny_backbone, patch_num=13, num_workers=0,
            target_ratio=1.25, transform="targetpad", bpe_path=bpe_file,
            clip_path=None, fusion_model_path=None, batch_size=8,
            split="val", quantize_towers=False, quantize_gallery=False,
            out=out, precision="fp32",
        )
        manifest = run_export(args)
        assert manifest["kind"] == "fashionern-serve"
        assert set(manifest["files"]) == {"1", "8", "32"}

        service = build_service(args)
        ref = service.gallery.names[0]
        live = service.query([ref], ["is red"], k=3)[0][0]

        art = load_serve_artifact(out)
        assert art.gallery_size == service.gallery_size
        ids = service.api.tokenize(["is red"])
        scores, rows = art.query(ids, [art.row_for(ref)], k=3)
        got = [(art.names[r], float(s)) for r, s in zip(rows[0], scores[0])]
        want = [(r["name"], r["score"]) for r in live]
        assert [n for n, _ in got] == [n for n, _ in want]
        np.testing.assert_allclose([s for _, s in got],
                                   [s for _, s in want], rtol=1e-5)

    def test_quantized_gallery_export_roundtrip(
            self, fiq_root, tiny_backbone, bpe_file, tmp_path):
        """`export --quantize-gallery`: the int8 gallery (values +
        per-row scales) travels in the consts sidecar and the reloaded
        artifact answers like the live quantized service."""
        from types import SimpleNamespace

        from fashionern_aaai2024_tpu.cli.main import build_service, run_export
        from fashionern_aaai2024_tpu.retrieval.artifact import (
            load_serve_artifact,
        )

        out = str(tmp_path / "artifact")
        args = SimpleNamespace(
            dataset="fashioniq", data_root=fiq_root,
            clip_model_name=tiny_backbone, patch_num=13, num_workers=0,
            target_ratio=1.25, transform="targetpad", bpe_path=bpe_file,
            clip_path=None, fusion_model_path=None, batch_size=8,
            split="val", quantize_towers=False, quantize_gallery=True,
            out=out, precision="fp32",
        )
        manifest = run_export(args)
        assert "int8" in manifest["consts_dtypes"]  # quantized gallery leaf
        service = build_service(args)
        ref = service.gallery.names[0]
        live = service.query([ref], ["is red"], k=3)[0][0]
        art = load_serve_artifact(out)
        ids = service.api.tokenize(["is red"])
        scores, rows = art.query(ids, [art.row_for(ref)], k=3)
        assert [art.names[r] for r in rows[0]] == [r["name"] for r in live]
        np.testing.assert_allclose(scores[0], [r["score"] for r in live],
                                   rtol=1e-5)

    def test_refresh_artifact_cli_republishes_and_reloads_daemon(
            self, fiq_root, tiny_backbone, bpe_file, tmp_path):
        """`fashionern refresh-artifact --reload-url ...`: republishes
        the consts sidecar from the checkpoint flags and POSTs /reload
        to the running daemon in one command."""
        import threading
        from types import SimpleNamespace

        from fashionern_aaai2024_tpu.cli.main import (
            run_export,
            run_refresh_artifact,
        )
        from fashionern_aaai2024_tpu.retrieval.server import (
            ArtifactService,
            serve,
        )

        out = str(tmp_path / "artifact")
        common = dict(
            dataset="fashioniq", data_root=fiq_root,
            clip_model_name=tiny_backbone, patch_num=13, num_workers=0,
            target_ratio=1.25, transform="targetpad", bpe_path=bpe_file,
            clip_path=None, fusion_model_path=None, batch_size=8,
            split="val", quantize_towers=False, quantize_gallery=False,
            precision="fp32",
        )
        run_export(SimpleNamespace(**common, out=out))
        svc = ArtifactService(out, warmup=False)
        srv = serve(svc, host="127.0.0.1", port=0, dynamic_batching=False)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        port = srv.server_address[1]

        before = os.path.getmtime(os.path.join(out, "consts.npz"))
        manifest = run_refresh_artifact(SimpleNamespace(
            **common, artifact=out,
            reload_url=f"http://127.0.0.1:{port}"))
        assert manifest["kind"] == "fashionern-serve"
        assert os.path.getmtime(os.path.join(out, "consts.npz")) >= before
        srv.shutdown()

    def test_serve_artifact_parser_is_model_free(self):
        """The deploy-host subcommand takes only the artifact + HTTP
        flags — none of the dataset/model/checkpoint surface."""
        from fashionern_aaai2024_tpu.cli.main import build_parser

        args = build_parser().parse_args(
            ["serve-artifact", "--artifact", "/x", "--port", "9"])
        assert args.command == "serve-artifact"
        assert args.artifact == "/x" and args.port == 9
        assert not args.no_dynamic_batching
        assert not args.allow_platform_mismatch
        assert not hasattr(args, "data_root")
        assert not hasattr(args, "clip_model_name")

    def test_refresh_consts_swaps_weights_without_reexport(
            self, fiq_root, tiny_backbone, bpe_file, tmp_path):
        """The consts.npz sidecar is swappable for a retrained
        checkpoint with the same tree: scaling the baked gallery 2x via
        refresh_consts doubles the served scores through the ORIGINAL
        programs; a shape change is refused with a clear error."""
        from types import SimpleNamespace

        import jax

        from fashionern_aaai2024_tpu.cli.main import build_service, run_export
        from fashionern_aaai2024_tpu.retrieval.artifact import (
            load_serve_artifact,
            refresh_consts,
        )

        out = str(tmp_path / "artifact")
        args = SimpleNamespace(
            dataset="fashioniq", data_root=fiq_root,
            clip_model_name=tiny_backbone, patch_num=13, num_workers=0,
            target_ratio=1.25, transform="targetpad", bpe_path=bpe_file,
            clip_path=None, fusion_model_path=None, batch_size=8,
            split="val", quantize_towers=False, quantize_gallery=False,
            out=out, precision="fp32",
        )
        run_export(args)
        service = build_service(args)
        ids = service.api.tokenize(["is red"])
        art = load_serve_artifact(out)
        s1, r1 = art.query(ids, [0], k=3)

        variables, gal, ref_f, ref_p = service._serve_fn.consts
        fn2 = SimpleNamespace(consts=(variables, jax.numpy.asarray(gal) * 2,
                                      ref_f, ref_p))
        refresh_consts(out, fn2)
        art2 = load_serve_artifact(out)
        s2, r2 = art2.query(ids, [0], k=3)
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_allclose(s2, 2 * s1, rtol=1e-5)

        bad = SimpleNamespace(consts=(variables, jax.numpy.asarray(gal)[:, :4],
                                      ref_f, ref_p))
        with pytest.raises(ValueError, match="re-export"):
            refresh_consts(out, bad)

    def test_live_reload_picks_up_republished_consts(
            self, fiq_root, tiny_backbone, bpe_file, tmp_path):
        """POST /reload on a running artifact daemon: after
        refresh_consts republishes the sidecar, the SAME service
        instance serves the new weights/gallery — no restart, no
        recompile (scores double with a 2x-scaled gallery)."""
        import json as _json
        import threading
        import urllib.request
        from types import SimpleNamespace

        import jax

        from fashionern_aaai2024_tpu.cli.main import build_service, run_export
        from fashionern_aaai2024_tpu.retrieval.artifact import refresh_consts
        from fashionern_aaai2024_tpu.retrieval.server import (
            ArtifactService,
            serve,
        )

        out = str(tmp_path / "artifact")
        args = SimpleNamespace(
            dataset="fashioniq", data_root=fiq_root,
            clip_model_name=tiny_backbone, patch_num=13, num_workers=0,
            target_ratio=1.25, transform="targetpad", bpe_path=bpe_file,
            clip_path=None, fusion_model_path=None, batch_size=8,
            split="val", quantize_towers=False, quantize_gallery=False,
            out=out, precision="fp32",
        )
        run_export(args)
        service = build_service(args)
        svc = ArtifactService(out, warmup=False)
        srv = serve(svc, host="127.0.0.1", port=0, dynamic_batching=False)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        port = srv.server_address[1]

        def post(path, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                _json.dumps(payload).encode(),
                {"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=60) as r:
                return _json.loads(r.read())

        ref = service.gallery.names[0]
        before = post("/query", {"ref_name": ref, "caption": "is red",
                                 "k": 3})["results"]

        variables, gal, ref_f, ref_p = service._serve_fn.consts
        refresh_consts(out, SimpleNamespace(
            consts=(variables, jax.numpy.asarray(gal) * 2, ref_f, ref_p)))
        resp = post("/reload", {})
        assert resp["reloaded"] and resp["gallery_size"] == svc.gallery_size

        after = post("/query", {"ref_name": ref, "caption": "is red",
                                "k": 3})["results"]
        assert [r["name"] for r in after] == [r["name"] for r in before]
        np.testing.assert_allclose([r["score"] for r in after],
                                   [2 * r["score"] for r in before],
                                   rtol=1e-5)
        srv.shutdown()

    def test_serve_artifact_http_parity(self, fiq_root, tiny_backbone,
                                        bpe_file, tmp_path):
        """`fashionern serve-artifact`: the artifact-backed HTTP daemon
        answers a composed query identically to the live (model-stack)
        service — the deploy-host path end-to-end."""
        import json as _json
        import threading
        import urllib.request
        from types import SimpleNamespace

        from fashionern_aaai2024_tpu.cli.main import build_service, run_export
        from fashionern_aaai2024_tpu.retrieval.server import (
            ArtifactService,
            serve,
        )

        out = str(tmp_path / "artifact")
        args = SimpleNamespace(
            dataset="fashioniq", data_root=fiq_root,
            clip_model_name=tiny_backbone, patch_num=13, num_workers=0,
            target_ratio=1.25, transform="targetpad", bpe_path=bpe_file,
            clip_path=None, fusion_model_path=None, batch_size=8,
            split="val", quantize_towers=False, quantize_gallery=False,
            out=out, precision="fp32",
        )
        run_export(args)
        live = build_service(args)
        ref = live.gallery.names[0]
        want = live.query([ref], ["is red"], k=3)[0][0]

        svc = ArtifactService(out)
        assert svc.gallery_size == live.gallery_size
        httpd = serve(svc, port=0)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            port = httpd.server_address[1]
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/query",
                data=_json.dumps({"ref_name": ref, "caption": "is red",
                                  "k": 3}).encode(),
                headers={"Content-Type": "application/json"}, method="POST")
            with urllib.request.urlopen(req) as r:
                data = _json.loads(r.read())
            assert [x["name"] for x in data["results"]] == \
                [x["name"] for x in want]
            np.testing.assert_allclose(
                [x["score"] for x in data["results"]],
                [x["score"] for x in want], rtol=1e-5)
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/stats") as r:
                stats = _json.loads(r.read())
            assert stats["artifact"]["dir"] == out
            # unknown refs still 404 through the artifact path
            bad = urllib.request.Request(
                f"http://127.0.0.1:{port}/query",
                data=_json.dumps({"ref_name": "nope", "caption": "x"}
                                 ).encode(), method="POST")
            try:
                urllib.request.urlopen(bad)
                assert False, "expected 404"
            except urllib.error.HTTPError as e:
                assert e.code == 404
        finally:
            httpd.shutdown()
            if svc.batcher is not None:
                svc.batcher.close()

    def test_platform_mismatch_refused(self, fiq_root, tiny_backbone,
                                       bpe_file, tmp_path):
        import json as _json

        from fashionern_aaai2024_tpu.retrieval.artifact import (
            load_serve_artifact,
        )

        out = tmp_path / "art2"
        out.mkdir()
        (out / "manifest.json").write_text(_json.dumps(
            {"kind": "fashionern-serve", "platform": "tpu", "files": {},
             "k_max": 1, "gallery_size": 1, "context_length": 16,
             "buckets": [1], "feature_dim": 8, "artifact_version": 1}))
        with pytest.raises(ValueError, match="platform"):
            load_serve_artifact(str(out))
        art = load_serve_artifact(str(out), allow_platform_mismatch=True)
        assert art.manifest["platform"] == "tpu"
