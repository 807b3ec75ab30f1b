"""Batch pipeline: host-side assembly + background prefetch to device.

Replaces the reference's torch DataLoader + `prepare_data`
(AttnGAN2/code/main.py:131-133, datasets.py:28-56) with a TPU-native design:

* **no sort-by-length** — the masked encoders make packing unnecessary, so
  batches keep input order at static shape (SURVEY.md build plan §1);
* ``num_workers`` threads decode samples concurrently (PIL JPEG decode and
  the native C++ loader both release the GIL), overlapping host
  preprocessing with device compute — the analogue of the reference's
  ``DataLoader(num_workers=cfg.WORKERS)`` worker processes
  (AttnGAN2/code/main.py:131-133);
* sample augmentation randomness comes from the dataset's per-(epoch,index)
  streams, so batches are bit-identical for any worker count or completion
  order;
* batches are device_put with an explicit data-parallel sharding when a mesh
  is supplied, so each host feeds only its addressable shard.
"""

from __future__ import annotations

import queue
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
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
    # astype(copy=False): a no-op cast on this host's numpy is a ~250x
    # slower element loop than memcpy (11s for a stacked 128x256x256x3
    # batch), so never copy when the dtype already matches.
    n_branches = len(samples[0][0])
    imgs = tuple(
        np.stack([s[0][b] for s in samples]).astype(np.float32, copy=False)
        for b in range(n_branches)
    )
    captions = np.stack([s[1] for s in samples]).astype(np.int32, copy=False)
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
        host_shard: Optional[tuple] = None,
    ):
        """``host_shard=(process_index, process_count)`` makes this loader
        yield only its process's contiguous slice of every global batch
        (multi-host data parallelism under ``parallel.init_distributed``):
        the permutation RNG is seed-deterministic and identical on every
        process, so the per-host slices are DISJOINT and their union COVERS
        each global batch exactly — no host ever decodes another host's
        samples (the reference has no multi-host input path at all;
        SURVEY.md §2.4).  ``batch_size`` stays the GLOBAL batch size."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(0, num_workers)
        self.sharding = sharding
        self.prefetch = prefetch
        if host_shard is not None:
            idx, cnt = host_shard
            if not (0 <= idx < cnt):
                raise ValueError(f"host_shard index {idx} not in [0, {cnt})")
            if batch_size % cnt != 0:
                raise ValueError(
                    f"global batch {batch_size} not divisible by "
                    f"process count {cnt}")
        self.host_shard = host_shard
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

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
            idxs = order[i * self.batch_size : (i + 1) * self.batch_size]
            if self.host_shard is not None:
                pi, pc = self.host_shard
                per = self.batch_size // pc
                idxs = idxs[pi * per : (pi + 1) * per]
            yield idxs

    def _to_device(self, batch: Batch) -> Batch:
        if self.sharding is None:
            return batch
        if self.host_shard is not None and self.host_shard[1] > 1:
            # multi-host: each process holds only its local slice; assemble
            # the GLOBAL jax.Array from per-process shards (the data-
            # parallel dual of jax.device_put below).
            def put(x):
                return jax.make_array_from_process_local_data(
                    self.sharding, np.asarray(x))
        else:
            def put(x):
                return jax.device_put(x, self.sharding)
        return Batch(
            tuple(put(x) for x in batch.imgs),
            put(batch.captions),
            put(batch.cap_lens),
            put(batch.class_ids),
            batch.keys,
        )

    def _make_batch(self, idxs) -> Batch:
        return self._to_device(
            collate([self.dataset[int(i)] for i in idxs])
        )

    def __iter__(self) -> Iterator[Batch]:
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self._epoch)
        self._epoch += 1
        if self.num_workers == 0:
            for idxs in self._batch_indices():
                yield self._make_batch(idxs)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()
        getitem = self.dataset.__getitem__

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    pass
            return False

        def producer():
            # N workers fetch samples; a sliding window keeps up to
            # prefetch+1 batches in flight while batches are collated and
            # emitted strictly in order.  `stop` lets an abandoned iterator
            # tear the pool down instead of leaking busy threads.
            pool = ThreadPoolExecutor(self.num_workers)
            try:
                window: deque = deque()

                def finish(futs) -> bool:
                    return put(self._to_device(
                        collate([f.result() for f in futs])
                    ))

                for idxs in self._batch_indices():
                    if stop.is_set():
                        return
                    window.append(
                        [pool.submit(getitem, int(i)) for i in idxs]
                    )
                    while len(window) > max(1, self.prefetch):
                        if not finish(window.popleft()):
                            return
                while window:
                    if not finish(window.popleft()):
                        return
            except BaseException as e:  # surfaced in the consumer
                put(e)
            finally:
                pool.shutdown(wait=False, cancel_futures=True)
                put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


def data_sharding(mesh: jax.sharding.Mesh) -> jax.sharding.NamedSharding:
    """Batch-dim sharding over the `data` mesh axis (alias of
    sba_gan_tpu.parallel.batch_sharding — one definition)."""
    from sba_gan_tpu.parallel.mesh import batch_sharding

    return batch_sharding(mesh)
