"""Batching, sharding, and prefetching host->device input pipeline.

Replaces the reference's DataLoader(num_workers=8) + DistributedSampler
(train.py:96-98) with a TPU-native pipeline:

  * ShardedSampler — deterministic per-epoch permutation, sliced per
    host process (the DistributedSampler contract: same seed on every
    host, disjoint index ranges, `set_epoch` reshuffle).
  * Loader — worker threads run dataset.__getitem__ (PIL/cv2 release
    the GIL for the heavy parts), collate to batch-major numpy, and a
    bounded queue keeps up to `prefetch` device batches in flight so
    host decode overlaps device compute.
  * device_put with a batch-axis NamedSharding when a mesh is given, so
    the batch lands already sharded for the pjit train step.
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional, Sequence

import numpy as np


class ShardedSampler:
    """Deterministic, host-sharded index sampler
    (reference: torch DistributedSampler, train.py:96)."""

    def __init__(self, n: int, num_shards: int = 1, shard: int = 0,
                 shuffle: bool = True, seed: int = 0,
                 drop_last: bool = False):
        assert 0 <= shard < num_shards
        self.n, self.num_shards, self.shard = n, num_shards, shard
        self.shuffle, self.seed, self.epoch = shuffle, seed, 0
        self.drop_last = drop_last

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[int]:
        if self.shuffle:
            order = np.random.default_rng(
                np.random.SeedSequence([self.seed, self.epoch])
            ).permutation(self.n)
        else:
            order = np.arange(self.n)
        if self.drop_last:
            per = self.n // self.num_shards
            order = order[: per * self.num_shards]
        else:  # pad so every shard sees the same count
            pad = (-len(order)) % self.num_shards
            order = np.concatenate([order, order[:pad]])
        return iter(order[self.shard::self.num_shards].tolist())

    def __len__(self) -> int:
        if self.drop_last:
            return self.n // self.num_shards
        return (self.n + self.num_shards - 1) // self.num_shards


def collate(samples: Sequence[Dict]) -> Dict:
    """Stack numeric fields batch-major; collect 'info' dicts as a list."""
    out: Dict = {}
    for key in samples[0]:
        if key == "info":
            out[key] = [s[key] for s in samples]
        else:
            out[key] = np.stack([np.asarray(s[key]) for s in samples])
    return out


class Loader:
    """Threaded prefetching loader.

    dataset: random-access mapping with __getitem__/__len__ (and
    optionally set_epoch). When `mesh` is provided, batches are
    device_put with the batch axis sharded over `axis`.
    """

    def __init__(self, dataset, batch_size: int,
                 sampler: Optional[ShardedSampler] = None,
                 num_workers: int = 8, prefetch: int = 2,
                 drop_last: bool = True, mesh=None, axis: str = "data"):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler or ShardedSampler(len(dataset))
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.mesh, self.axis = mesh, axis

    def set_epoch(self, epoch: int) -> None:
        self.sampler.set_epoch(epoch)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self) -> int:
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def _device_put(self, batch: Dict):
        if self.mesh is None:
            return batch
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(self.mesh, P(self.axis))
        return {
            k: (v if k == "info"
                else jax.device_put(v, sharding))
            for k, v in batch.items()
        }

    def __iter__(self):
        from concurrent.futures import ThreadPoolExecutor

        indices = list(self.sampler)
        if self.drop_last:
            usable = len(indices) // self.batch_size * self.batch_size
            indices = indices[:usable]
        batches = [indices[i:i + self.batch_size]
                   for i in range(0, len(indices), self.batch_size)]
        if not batches:
            return

        # Bounded queue = backpressure: at most `prefetch` collated
        # batches plus one in-flight batch of samples ever exist.
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        _END = object()

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for batch in batches:
                        samples = list(pool.map(
                            self.dataset.__getitem__, batch))
                        out_q.put(collate(samples))
                out_q.put(_END)
            except Exception as e:  # surface in the consumer
                out_q.put(e)

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()
        while True:
            item = out_q.get()
            if item is _END:
                return
            if isinstance(item, Exception):
                raise item
            yield self._device_put(item)
