"""Host-side batched loader with per-process sharding and prefetch.

Replaces the reference's `DataLoader(num_workers=4, pin_memory=True)` +
`DistributedSampler` pair (`run/train/train_fiq.py:62-74`). Each JAX
process iterates its own shard (rank/world), batches into numpy arrays
(strings stay Python lists), and a thread pool prefetches ahead of the
device so decode/`.npy` IO overlaps with TPU compute.
"""

from __future__ import annotations

import concurrent.futures as futures
from typing import Any, Iterator, Sequence

import numpy as np


def default_collate(items: Sequence[dict]) -> dict:
    """Dict-of-stacked-arrays collate. None items (skip_corrupt datasets)
    are dropped, mirroring the reference collate_fn (`utils/utils.py:22-29`)."""
    items = [it for it in items if it is not None]
    if not items:
        return {}
    out: dict[str, Any] = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(vals[0], (int, float, np.integer, np.floating)):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals  # strings / lists of strings
    return out


class Loader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 42,
        rank: int = 0,
        world_size: int = 1,
        drop_last: bool = False,
        num_workers: int = 8,
        collate=default_collate,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.collate = collate
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """DistributedSampler-style epoch-dependent shuffling."""
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        # pad so every rank sees the same number of samples (DistributedSampler semantics)
        if self.world_size > 1:
            per_rank = -(-n // self.world_size)
            padded = np.concatenate([idx, idx[: per_rank * self.world_size - n]])
            idx = padded[self.rank :: self.world_size]
        return idx

    def __len__(self) -> int:
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        idx = self._indices()
        batches = [
            idx[i : i + self.batch_size] for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()

        if self.num_workers <= 0:
            for b in batches:
                yield self.collate([self.dataset[int(i)] for i in b])
            return

        # Per-ITEM futures, two batches ahead: decodes of a batch run on
        # all workers concurrently (a whole-batch task would serialize
        # its items on one thread — measured 1.0x scaling at any worker
        # count; per-item gives near-linear scaling for decode-bound
        # datasets).
        with futures.ThreadPoolExecutor(self.num_workers) as pool:
            depth = 2

            def submit(b):
                return [pool.submit(self.dataset.__getitem__, int(i)) for i in b]

            pending = [submit(b) for b in batches[:depth]]
            for i, _ in enumerate(batches):
                if i + depth < len(batches):
                    pending.append(submit(batches[i + depth]))
                yield self.collate([f.result() for f in pending[i]])
