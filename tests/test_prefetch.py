"""Host→device prefetch pipeline (data/prefetch.py) — VERDICT r4 #5.

The pipeline must be a pure reordering of WHEN work happens: every
consumer sees the same items in the same order, with exceptions at the
same position, and the train/embed paths produce bit-identical results
with prefetch on or off.
"""

import numpy as np
import pytest

from fashionern_aaai2024_tpu.data.prefetch import prefetch_iter
from fashionern_aaai2024_tpu.parallel import mesh as meshlib

from tests.test_train import _synthetic_trainer  # noqa: F401 (fixture deps)


class TestPrefetchIter:
    def test_matches_serial_map(self):
        items = list(range(17))
        fn = lambda i, x: (i, x * 2)  # noqa: E731
        assert list(prefetch_iter(items, fn, depth=3)) == [
            (i, x * 2) for i, x in enumerate(items)
        ]

    def test_passthrough_without_fn(self):
        assert list(prefetch_iter("abc", None, depth=2)) == list("abc")

    def test_depth_zero_is_serial(self):
        calls = []
        fn = lambda i, x: calls.append(i) or x  # noqa: E731
        out = list(prefetch_iter([10, 20], fn, depth=0))
        assert out == [10, 20] and calls == [0, 1]

    def test_exception_surfaces_at_position(self):
        def fn(i, x):
            if i == 2:
                raise ValueError("boom")
            return x

        it = prefetch_iter(range(5), fn, depth=2)
        assert next(it) == 0 and next(it) == 1
        with pytest.raises(ValueError, match="boom"):
            next(it)

    def test_early_break_does_not_deadlock(self):
        # queue depth 1, 100 items: the worker would block on a full
        # queue forever if abandonment didn't release it
        it = prefetch_iter(range(100), None, depth=1)
        for k, _ in zip(range(3), it):
            pass
        it.close()  # generator finalizer sets the stop event

    def test_runs_ahead_of_consumer(self):
        import threading

        started = threading.Event()

        def fn(i, x):
            if i == 1:
                started.set()
            return x

        it = prefetch_iter(range(4), fn, depth=2)
        assert next(it) == 0
        # item 1 was prepared in the background without another next()
        assert started.wait(timeout=5.0)
        assert list(it) == [1, 2, 3]


class TestEmbedGalleryPrefetch:
    def test_prefetch_matches_serial(self):
        from fashionern_aaai2024_tpu.retrieval.engine import embed_gallery

        rng = np.random.default_rng(0)
        items = [{"name": f"i{k}",
                  "image": rng.standard_normal((8, 8, 3)).astype(np.float32),
                  "patch": rng.standard_normal((2, 4)).astype(np.float32)}
                 for k in range(11)]
        from fashionern_aaai2024_tpu.data.loader import Loader
        import jax

        loader = Loader(items, 4, num_workers=0)
        fn = jax.jit(lambda imgs: (imgs.mean(axis=(1, 2)),
                                   imgs.reshape(imgs.shape[0], -1)[:, :5]))
        a = embed_gallery(fn, loader, 4, keep_tokens=True, prefetch=0)
        b = embed_gallery(fn, loader, 4, keep_tokens=True, prefetch=2)
        assert a.names == b.names
        np.testing.assert_array_equal(a.features, b.features)
        np.testing.assert_array_equal(a.token_features, b.token_features)
        np.testing.assert_array_equal(a.local_features, b.local_features)


class TestTrainerPrefetch:
    def test_losses_identical_with_and_without_prefetch(self, tmp_path):
        # prefetch keys caption rng by step id, so the trajectory must
        # be bit-identical to the serial feed
        losses = {}
        for depth in (0, 3):
            rec: list = []
            tr = _synthetic_trainer(tmp_path / f"d{depth}",
                                    record_losses=rec,
                                    num_epochs=2, prefetch_batches=depth)
            tr.train()
            losses[depth] = rec
        assert len(losses[0]) > 0
        assert losses[0] == losses[3]
