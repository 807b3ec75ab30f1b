"""Per-host input sharding (VERDICT r4 next-#8, SURVEY §2.4): under
multi-host data parallelism each process's DataLoader must yield a
DISJOINT slice of every global batch, and the slices must COVER it.

The property is host-side and seed-deterministic, so it is asserted
directly by instantiating one loader per simulated process (same seed)
— no process spawning required; the 2-process DCN harness
(scripts/multihost_dryrun.py) additionally exercises the global-array
assembly path end to end.
"""

import numpy as np
import pytest

from sba_gan_tpu.data.pipeline import DataLoader


class _ToyDataset:
    """Minimal map-style dataset: key encodes the sample index."""

    def __init__(self, n: int):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        img = np.full((4, 4, 3), i, np.float32)
        caption = np.full((6,), i, np.int32)
        return ([img], caption, 3, i % 5, f"k{i}")


def _epoch_keys(loader):
    return [batch.keys for batch in loader]


def test_host_shards_disjoint_and_covering():
    n, gb, pc = 48, 12, 4
    full = DataLoader(_ToyDataset(n), gb, seed=7, num_workers=0)
    shards = [
        DataLoader(_ToyDataset(n), gb, seed=7, num_workers=0,
                   host_shard=(pi, pc))
        for pi in range(pc)
    ]
    full_epoch = _epoch_keys(full)
    shard_epochs = [_epoch_keys(s) for s in shards]
    assert len(full_epoch) == len(shard_epochs[0]) == n // gb
    for b, global_keys in enumerate(full_epoch):
        per_host = [set(se[b]) for se in shard_epochs]
        # disjoint
        for i in range(pc):
            for j in range(i + 1, pc):
                assert not (per_host[i] & per_host[j]), (i, j, b)
        # covering, equal split
        union = set().union(*per_host)
        assert union == set(global_keys)
        assert all(len(s) == gb // pc for s in per_host)


def test_host_shard_batch_contents_match_keys():
    """The sliced batch's arrays carry exactly the sliced samples (keys
    and class_ids/images agree index-for-index)."""
    loader = DataLoader(_ToyDataset(24), 8, seed=3, num_workers=0,
                        host_shard=(1, 2))
    for batch in loader:
        ids = [int(k[1:]) for k in batch.keys]
        np.testing.assert_array_equal(batch.captions[:, 0], ids)
        np.testing.assert_array_equal(
            batch.imgs[0][:, 0, 0, 0], np.asarray(ids, np.float32))


def test_host_shard_validation():
    with pytest.raises(ValueError):
        DataLoader(_ToyDataset(8), 8, host_shard=(2, 2))
    with pytest.raises(ValueError):
        DataLoader(_ToyDataset(8), 6, host_shard=(0, 4))
