"""Dataloaders: multi-threaded prefetching host pipeline feeding device batches.

Replaces the reference's torch DataLoader workers + InfiniteDataLoader
(data/build.py:28-180). Host threads do cv2 decode + augment; batches are
stacked numpy and handed to the trainer, which device_puts them with a 'dp'
batch sharding (per-host sharding replaces DistributedSampler).
"""

from __future__ import annotations

import queue
import threading

import numpy as np


def collate(items: list[dict]) -> dict:
    """Stack per-sample dicts into batch arrays (static shapes from max_labels).

    Images stay uint8: the host->device copy is 4x smaller and normalization
    fuses into the consumer jit (north-star device-side preprocessing).
    """
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


class DataLoader:
    """Epoch-based loader with background worker threads and prefetch queue."""

    def __init__(self, dataset, batch_size=16, shuffle=True, workers=4, seed=0,
                 drop_last=True, prefetch=4, pad_last=False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.workers = max(1, workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.pad_last = pad_last  # pad the tail batch to full size (one jit executable)
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        batches = [idx[i:i + self.batch_size] for i in range(0, n, self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for b in batches:
                    if stop.is_set():
                        break
                    npad = 0
                    if self.pad_last and len(b) < self.batch_size:
                        npad = self.batch_size - len(b)
                        b = np.concatenate([b, np.repeat(b[-1:], npad)])
                    items = [self.dataset[int(j)] for j in b]
                    out = collate(items)
                    if self.pad_last:
                        out["_pad"] = npad  # trailing samples are duplicates, skip in metrics
                    q.put(out)
            finally:
                q.put(None)

        # one producer thread with an internal item pool keeps ordering deterministic;
        # parallelism comes from cv2's internal threading + prefetch overlap
        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()


def build_dataloader(dataset, batch_size=16, shuffle=True, workers=4, seed=0,
                     drop_last=True, pad_last=False):
    return DataLoader(dataset, batch_size=batch_size, shuffle=shuffle, workers=workers,
                      seed=seed, drop_last=drop_last, pad_last=pad_last)
