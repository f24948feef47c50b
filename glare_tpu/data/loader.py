"""Minimal batch loader with shuffling and async device prefetch.

Replaces the reference's torch DataLoader (num_workers forced 0,
code/data/__init__.py:10-25) and the basicsr CUDAPrefetcher side-stream
(prefetch_dataloader.py:84-125): here prefetch means we dispatch
``jax.device_put`` for batch k+1 while batch k computes — JAX's async
dispatch overlaps the H2D copy with the running step.
"""

from __future__ import annotations

import threading
import queue as queue_mod
from typing import Any, Dict, Iterator, Optional

import numpy as np


class DataLoader:
    def __init__(self, dataset, batch_size=1, shuffle=False, drop_last=False, seed=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self.rng.shuffle(order)
        self.epoch += 1
        for start in range(0, n, self.batch_size):
            idx = order[start : start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                return
            samples = [self.dataset[int(i)] for i in idx]
            yield _collate(samples)


def _collate(samples):
    out: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals, axis=0)
        else:
            out[key] = vals
    return out


class PrefetchDataLoader:
    """Thread+queue prefetcher (reference: prefetch_dataloader.py:8-60)."""

    def __init__(self, loader: DataLoader, num_prefetch=2):
        self.loader = loader
        self.num_prefetch = num_prefetch

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.num_prefetch)
        _SENTINEL = object()

        def producer():
            for item in self.loader:
                q.put(item)
            q.put(_SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            yield item


def create_dataloader(train, dataset, dataset_opt, opt=None, sampler=None, seed=0):
    """Factory with reference defaults (code/data/__init__.py:10-25)."""
    if train:
        batch_size = dataset_opt.get("batch_size") or 1
        return DataLoader(dataset, batch_size=batch_size, shuffle=True, drop_last=True, seed=seed)
    return DataLoader(dataset, batch_size=1, shuffle=False, drop_last=False, seed=seed)
