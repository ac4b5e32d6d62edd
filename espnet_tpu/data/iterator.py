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

    def num_batches(self, epoch: int) -> int:
        """Steps this epoch (drives the multi-host uneven-data stop)."""
        if self.num_iters_per_epoch is not None:
            return self.num_iters_per_epoch
        return len(self.batches)

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


class ChunkIterFactory:
    """Random fixed-length chunk views of long utterances
    (espnet2/iterators/chunk_iter_factory.py:19 behavior — enh/diar
    training on fixed windows; chunks are static-shape by construction,
    the TPU-friendliest batching there is).

    Chunks all sequence keys sharing the primary key's length (e.g.
    speech_mix/speech_ref1/speech_ref2); scalar/mismatched keys pass
    through unchunked.
    """

    def __init__(self, dataset, keys, collate_fn, chunk_length: int = 16000,
                 batch_size: int = 8, primary_key: str = None,
                 num_chunks_per_utt: int = 1, seed: int = 0,
                 shuffle: bool = True):
        self.dataset = dataset
        self.keys = list(keys)
        self.collate_fn = collate_fn
        self.chunk_length = chunk_length
        self.batch_size = batch_size
        self.primary_key = primary_key
        self.num_chunks = num_chunks_per_utt
        self.seed = seed
        self.shuffle = shuffle

    def build_iter(self, epoch: int, shuffle: Optional[bool] = None):
        rng = np.random.RandomState(self.seed + epoch)
        keys = list(self.keys)
        if (self.shuffle if shuffle is None else shuffle):
            rng.shuffle(keys)
        buf = []
        for k in keys:
            uid, data = self.dataset[k]
            primary = self.primary_key or next(
                n for n, v in data.items()
                if isinstance(v, np.ndarray) and v.ndim >= 1)
            L = len(data[primary])
            C = self.chunk_length
            for _ in range(self.num_chunks):
                if L <= C:
                    chunk = {n: (np.pad(v, [(0, C - L)] + [(0, 0)] * (
                        v.ndim - 1)) if isinstance(v, np.ndarray)
                        and v.ndim >= 1 and len(v) == L else v)
                        for n, v in data.items()}
                else:
                    s = rng.randint(0, L - C + 1)
                    chunk = {n: (v[s:s + C] if isinstance(v, np.ndarray)
                             and v.ndim >= 1 and len(v) == L else v)
                             for n, v in data.items()}
                buf.append((uid, chunk))
                if len(buf) == self.batch_size:
                    yield self.collate_fn(buf, bucket=False)
                    buf = []
        if buf:
            yield self.collate_fn(buf, bucket=False)


def prefetch(iterator, depth: int = 2):
    """Run `iterator` in a thread, yielding with `depth`-deep buffering
    so host IO overlaps device compute."""
    q: Queue = Queue(maxsize=depth)
    _END = object()

    def worker():
        # exceptions are forwarded to the consumer (a swallowed loader
        # error would otherwise silently truncate the epoch)
        try:
            for item in iterator:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # noqa: BLE001
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, BaseException):
            raise item
        yield item


class CategoryIterFactory:
    """Epoch-reproducible category-balanced iteration
    (espnet2/iterators/category_iter_factory.py role): batches are
    REBUILT each epoch with rng(seed+epoch) so category interleaving
    varies while staying resumable."""

    def __init__(self, dataset, utt2category, collate_fn,
                 batch_size: int = 8, seed: int = 0, shuffle: bool = True,
                 drop_last: bool = False, mode: str = "catbel",
                 utt2len=None, utt2dataset=None, beta: float = 1.0,
                 beta_dataset: float = 1.0):
        self.dataset = dataset
        self.utt2category = dict(utt2category)
        self.collate_fn = collate_fn
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last
        #: catbel (round-robin balance) | catpow (duration power-law) |
        #: catpow_balance (hierarchical dataset->category power-law)
        self.mode = mode
        self.utt2len = dict(utt2len or {})
        self.utt2dataset = dict(utt2dataset or {})
        self.beta = beta
        self.beta_dataset = beta_dataset

    def _batches(self, epoch: int, shuffle):
        from espnet_tpu.data.batching import (
            category_balanced_batches, category_dataset_power_batches,
            category_power_batches)
        do_shuffle = self.shuffle if shuffle is None else shuffle
        rng = np.random.RandomState(self.seed + epoch)
        if self.mode == "catpow":
            return category_power_batches(
                self.utt2category, self.utt2len, self.batch_size,
                beta=self.beta, rng=rng)
        if self.mode == "catpow_balance":
            return category_dataset_power_batches(
                self.utt2category, self.utt2dataset, self.utt2len,
                self.batch_size, beta_l=self.beta,
                beta_d=self.beta_dataset, rng=rng)
        return category_balanced_batches(
            self.utt2category, self.batch_size,
            rng if do_shuffle else None, drop_last=self.drop_last)

    def num_batches(self, epoch: int) -> int:
        return len(self._batches(epoch, None))

    def build_iter(self, epoch: int, shuffle=None):
        for keys in self._batches(epoch, shuffle):
            samples = [self.dataset[k] for k in keys]
            yield self.collate_fn(samples)


class MultipleIterFactory:
    """Chain several iter factories per epoch (espnet2/iterators/
    multiple_iter_factory.py): large corpora are split into shards, each
    built lazily; shard order shuffles per epoch."""

    def __init__(self, build_funcs, seed: int = 0, shuffle: bool = False):
        self.build_funcs = list(build_funcs)
        self.seed = seed
        self.shuffle = shuffle

    def num_batches(self, epoch: int):
        return None   # unknown without building every shard

    def build_iter(self, epoch: int, shuffle=None):
        do_shuffle = self.shuffle if shuffle is None else shuffle
        funcs = list(self.build_funcs)
        if do_shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(funcs)
        for build in funcs:
            factory = build()
            yield from factory.build_iter(epoch, shuffle)
