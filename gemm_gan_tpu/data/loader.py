"""Host batch iterator over an in-memory (or device-resident) dataset dict.

Replaces the reference's per-item-disk-read `Dataset`/`DataLoader` stack
(/root/reference/src/multi_patch_gan_dataloader.py:31-39 re-loads every
case's patch npy on every __getitem__). Here the full embedding set is
preloaded once (host RAM, optionally HBM via data/cache.py) and batches are
pure index gathers — the input pipeline is never the bottleneck.

Epoch shuffling is seeded per epoch (bitwise reproducible); for multi-host
runs each process iterates its own shard of the index space.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np


class Batches:
    def __init__(self, data: Dict[str, np.ndarray], batch_size: int,
                 seed: int = 42, shuffle: bool = True, drop_remainder: bool = True,
                 process_index: int = 0, process_count: int = 1):
        n = len(next(iter(data.values())))
        for k, v in data.items():
            assert len(v) == n, f"length mismatch for {k}"
        self.data = data
        self.n = n
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self.process_index = process_index
        self.process_count = process_count
        self._epoch = 0

    def seek(self, epoch: int):
        """Position the no-arg `epoch()` stream at `epoch` (resume support:
        the next call yields that epoch's deterministic batch order)."""
        self._epoch = epoch

    def __len__(self):
        per_host = self.n // self.process_count
        if self.drop_remainder:
            return per_host // self.batch_size
        return -(-per_host // self.batch_size)

    def epoch(self, epoch: Optional[int] = None) -> Iterator[Dict[str, np.ndarray]]:
        e = self._epoch if epoch is None else epoch
        if epoch is None:
            self._epoch += 1
        idx = np.arange(self.n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + e)
            idx = rng.permutation(idx)
        idx = idx[self.process_index::self.process_count]
        stop = (len(idx) // self.batch_size) * self.batch_size if self.drop_remainder else len(idx)
        for s in range(0, stop, self.batch_size):
            take = idx[s:s + self.batch_size]
            yield {k: v[take] for k, v in self.data.items()}

    def __iter__(self):
        return self.epoch()

    @property
    def n_full_batches(self) -> int:
        """Full-size batches per epoch — the length of `stacked_epoch`'s
        leading axis. 0 means the scan path is unusable (dataset smaller
        than one batch); callers should fall back to the per-batch path."""
        return (self.n // self.process_count) // self.batch_size

    def stacked_epoch(self, epoch: Optional[int] = None) -> Dict[str, np.ndarray]:
        """One epoch's batches stacked on a leading axis [K, B, ...] for the
        engine's `lax.scan` multi-step path (one device program per epoch).
        A ragged final batch (drop_remainder=False) cannot stack and is
        dropped here — scan requires uniform shapes."""
        if self.n_full_batches == 0:
            raise ValueError(
                f"stacked_epoch needs at least one full batch "
                f"(n={self.n}, batch_size={self.batch_size}); "
                "use the per-batch epoch() path")
        batches = [b for b in self.epoch(epoch)
                   if len(next(iter(b.values()))) == self.batch_size]
        return {k: np.stack([b[k] for b in batches]) for k in batches[0]}

    def subset(self, keys) -> "Batches":
        return Batches({k: self.data[k] for k in keys}, self.batch_size,
                       self.seed, self.shuffle, self.drop_remainder,
                       self.process_index, self.process_count)
