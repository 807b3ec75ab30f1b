"""Batch pipeline: host-side assembly + background prefetch to device.

Replaces the reference's torch DataLoader + `prepare_data`
(AttnGAN2/code/main.py:131-133, datasets.py:28-56) with a TPU-native design:

* **no sort-by-length** — the masked encoders make packing unnecessary, so
  batches keep input order at static shape (SURVEY.md build plan §1);
* worker threads overlap host preprocessing with device compute
  (the torch analogue is ``num_workers``, cfg.WORKERS);
* batches are device_put with an explicit data-parallel sharding when a mesh
  is supplied, so each host feeds only its addressable shard.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, NamedTuple, Optional

import jax
import numpy as np


class Batch(NamedTuple):
    imgs: tuple  # per-branch (B, S, S, 3) float32 in [-1, 1]
    captions: np.ndarray  # (B, T) int32
    cap_lens: np.ndarray  # (B,) int32
    class_ids: np.ndarray  # (B,) int32
    keys: tuple  # python strings; stays on host


def collate(samples) -> Batch:
    n_branches = len(samples[0][0])
    imgs = tuple(
        np.stack([s[0][b] for s in samples]).astype(np.float32)
        for b in range(n_branches)
    )
    captions = np.stack([s[1] for s in samples]).astype(np.int32)
    cap_lens = np.asarray([s[2] for s in samples], dtype=np.int32)
    class_ids = np.asarray([s[3] for s in samples], dtype=np.int32)
    keys = tuple(s[4] for s in samples)
    return Batch(imgs, captions, cap_lens, class_ids, keys)


class DataLoader:
    """Epoch iterator over a map-style dataset with shuffling, drop_last,
    optional threaded prefetch, and optional device sharding."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        num_workers: int = 2,
        sharding: Optional[jax.sharding.Sharding] = None,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(0, num_workers)
        self.sharding = sharding
        self.prefetch = prefetch
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        nb = len(self)
        for i in range(nb):
            yield order[i * self.batch_size : (i + 1) * self.batch_size]

    def _make_batch(self, idxs) -> Batch:
        batch = collate([self.dataset[int(i)] for i in idxs])
        if self.sharding is not None:
            imgs = tuple(
                jax.device_put(x, self.sharding) for x in batch.imgs
            )
            return Batch(
                imgs,
                jax.device_put(batch.captions, self.sharding),
                jax.device_put(batch.cap_lens, self.sharding),
                jax.device_put(batch.class_ids, self.sharding),
                batch.keys,
            )
        return batch

    def __iter__(self) -> Iterator[Batch]:
        if self.num_workers == 0:
            for idxs in self._batch_indices():
                yield self._make_batch(idxs)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                for idxs in self._batch_indices():
                    q.put(self._make_batch(idxs))
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item


def data_sharding(mesh: jax.sharding.Mesh) -> jax.sharding.NamedSharding:
    """Batch-dim sharding over the `data` mesh axis (alias of
    sba_gan_tpu.parallel.batch_sharding — one definition)."""
    from sba_gan_tpu.parallel.mesh import batch_sharding

    return batch_sharding(mesh)
