"""Host-side batch iteration: shuffling, per-host sharding, prefetch.

Replaces the reference's DataLoader(batch_size=1) + DistributedSampler +
EpochDataLoader stack (liteasr/trainer.py:48-62, liteasr/utils/data_loader.py:6-29).
Per-host sharding uses ``jax.process_index()`` — the JAX-idiomatic equivalent
of DistributedSampler; a small thread pool overlaps feature I/O + collation
with device compute.
"""

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np


class EpochDataLoader:
    """Infinite iterator over a batchified dataset; bumps ``epoch`` when the
    underlying pass completes (reference utils/data_loader.py:6-29)."""

    def __init__(
        self,
        dataset,
        collate_fn: Optional[Callable] = None,
        shuffle: bool = True,
        seed: int = 0,
        num_shards: int = 1,
        shard_index: int = 0,
        prefetch: int = 2,
        num_workers: int = 1,
    ):
        self.dataset = dataset
        self.collate_fn = collate_fn or dataset.collator
        self.shuffle = shuffle
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.prefetch = max(1, prefetch)
        self.num_workers = max(1, num_workers)
        self.epoch = 0

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + epoch)
            rng.shuffle(order)
        # per-host shard (rank::world_size over the shuffled order)
        return order[self.shard_index::self.num_shards]

    def epoch_iter(self, epoch: int) -> Iterator:
        """One pass over this host's shard for a given epoch, prefetched."""
        indices = self._epoch_indices(epoch)
        if len(indices) == 0:
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            try:
                for idx in indices:
                    q.put(self.collate_fn(self.dataset[int(idx)]))
                q.put(stop)
            except BaseException as e:  # propagate into the consumer
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        t.join()

    def __iter__(self):
        while True:
            for batch in self.epoch_iter(self.epoch):
                yield batch
            self.epoch += 1

    def __len__(self):
        return len(self._epoch_indices(0))
