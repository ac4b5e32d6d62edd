"""Epoch-reproducible batch iteration with host->device prefetch.

Behavioral contract: espnet2/iterators/sequence_iter_factory.py:35-41
(seed + epoch shuffling for exact resume reproducibility) — here without
torch DataLoader: a generator yields collated numpy batches; a
single-slot prefetcher overlaps host loading with device compute
(SURVEY.md hard-parts #7).
"""

from __future__ import annotations

import threading
from queue import Queue
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np


class SequenceIterFactory:
    def __init__(self,
                 dataset,
                 batches: Sequence[Tuple[str, ...]],
                 collate_fn: Callable,
                 seed: int = 0,
                 shuffle: bool = True,
                 num_iters_per_epoch: Optional[int] = None):
        self.dataset = dataset
        self.batches = list(batches)
        self.collate_fn = collate_fn
        self.seed = seed
        self.shuffle = shuffle
        self.num_iters_per_epoch = num_iters_per_epoch

    def build_iter(self, epoch: int, shuffle: Optional[bool] = None):
        batches = list(self.batches)
        do_shuffle = self.shuffle if shuffle is None else shuffle
        if do_shuffle:
            rng = np.random.RandomState(self.seed + epoch)
            rng.shuffle(batches)
        if self.num_iters_per_epoch is not None:
            # cycle deterministically so each epoch sees a different slice
            n = self.num_iters_per_epoch
            start = (n * (epoch - 1)) % max(len(batches), 1)
            batches = (batches * ((n + len(batches) - 1) // len(batches) + 1)
                       )[start:start + n]
        for keys in batches:
            samples = [self.dataset[k] for k in keys]
            yield self.collate_fn(samples)


def prefetch(iterator, depth: int = 2):
    """Run `iterator` in a thread, yielding with `depth`-deep buffering
    so host IO overlaps device compute."""
    q: Queue = Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield item
