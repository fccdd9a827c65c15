"""Minimal numpy data loading: Subset, collation, batched loaders with
background prefetch.

Replaces torch's DataLoader/Subset in the reference pipeline. Batches are
dicts of stacked numpy arrays (strings collect into lists); an optional
prefetch thread overlaps host-side sample assembly with device compute.
"""
from __future__ import annotations

import queue
import threading

import numpy as np


class Subset:
    """A view over a dataset restricted to `indices`."""

    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(int(i) for i in indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]


def default_collate(samples):
    """Stack a list of sample dicts into a batch dict (recursively)."""
    if not samples:
        raise ValueError('default_collate::empty batch')
    first = samples[0]
    if isinstance(first, dict):
        return {key: default_collate([s[key] for s in samples]) for key in first}
    if isinstance(first, str):
        return [s for s in samples]
    return np.stack([np.asarray(s) for s in samples])


class DataLoader:
    """Batched iteration over a dataset/Subset.

    * `batch_sampler`: iterable of index lists (overrides batch_size/shuffle)
    * `shuffle`: fresh permutation per epoch from its own RNG
    * `prefetch`: assemble the next batch on a worker thread while the
      current one is being consumed
    """

    def __init__(self, dataset, batch_size=1, shuffle=False, batch_sampler=None,
                 drop_last=False, collate_fn=default_collate, prefetch=1, seed=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.batch_sampler = batch_sampler
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self.prefetch = prefetch
        self._rng = np.random.default_rng(seed)

    def _batches(self):
        if self.batch_sampler is not None:
            yield from iter(self.batch_sampler)
            return
        order = np.arange(len(self.dataset))
        if self.shuffle:
            order = self._rng.permutation(order)
        for start in range(0, len(order), self.batch_size):
            chunk = order[start:start + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield chunk.tolist()

    def __len__(self):
        if self.batch_sampler is not None:
            return len(self.batch_sampler)
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self):
        if self.prefetch and self.prefetch > 0:
            return self._prefetch_iter()
        return (self.collate_fn([self.dataset[i] for i in batch])
                for batch in self._batches())

    def _prefetch_iter(self):
        q = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error_holder = []

        def worker():
            try:
                for batch_ids in self._batches():
                    q.put(self.collate_fn([self.dataset[i] for i in batch_ids]))
            except BaseException as e:  # propagate into the consumer
                error_holder.append(e)
            finally:
                q.put(sentinel)

        thread = threading.Thread(target=worker, daemon=True)
        thread.start()
        while True:
            item = q.get()
            if item is sentinel:
                if error_holder:
                    raise error_holder[0]
                return
            yield item
