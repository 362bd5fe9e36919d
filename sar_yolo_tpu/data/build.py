"""Dataloaders: multi-threaded prefetching host pipeline feeding device batches.

Replaces the reference's torch DataLoader worker processes + InfiniteDataLoader
(data/build.py:28-180). A `workers`-sized thread pool does cv2 decode + augment
— cv2 releases the GIL inside imread/resize/warpAffine, so threads genuinely
parallelize the heavy work without the reference's process-fork + tensor-IPC
overhead. Batches are stacked numpy and handed to the trainer, which
device_puts them with a 'dp' batch sharding (per-host sharding replaces
DistributedSampler). Sample RNG is keyed by (seed, epoch, index) so results
are deterministic regardless of worker count (≙ reference seed_worker,
data/build.py:38-43).
"""

from __future__ import annotations

import queue
import threading
from concurrent import futures
from concurrent.futures import ThreadPoolExecutor

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
        if hasattr(self.dataset, "epoch"):
            self.dataset.epoch = epoch  # keys per-sample augmentation RNG

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
        pool = ThreadPoolExecutor(max_workers=self.workers,
                                  thread_name_prefix="dataloader")

        def producer():
            try:
                # keep up to `prefetch` batches of item-futures in flight so the
                # pool stays busy across batch boundaries
                pending: list[tuple[list, int]] = []
                bi = 0

                def submit_next():
                    nonlocal bi
                    b = batches[bi]
                    bi += 1
                    npad = 0
                    if self.pad_last and len(b) < self.batch_size:
                        npad = self.batch_size - len(b)
                        b = np.concatenate([b, np.repeat(b[-1:], npad)])
                    futs = [pool.submit(self.dataset.__getitem__, int(j)) for j in b]
                    pending.append((futs, npad))

                while bi < len(batches) and len(pending) <= self.prefetch:
                    submit_next()
                while pending:
                    if stop.is_set():
                        break
                    futs, npad = pending.pop(0)
                    try:
                        items = [f.result() for f in futs]
                    except futures.CancelledError:
                        break  # consumer stopped early; pool was shut down
                    if bi < len(batches):
                        submit_next()
                    out = collate(items)
                    if self.pad_last:
                        out["_pad"] = npad  # trailing samples are duplicates, skip in metrics
                    while not stop.is_set():  # don't block forever on a gone consumer
                        try:
                            q.put(out, timeout=0.5)
                            break
                        except queue.Full:
                            continue
            finally:
                # sentinel must reach a live consumer; bounded retries so the
                # daemon thread can't spin forever if the consumer vanished
                # without its finally running (generator never closed/GC'd)
                for _ in range(240):  # <= 2 min of 0.5 s waits
                    try:
                        q.put(None, timeout=0.5)
                        break
                    except queue.Full:
                        if stop.is_set():
                            break

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                try:
                    batch = q.get(timeout=0.5)
                except queue.Empty:
                    # robust to a dropped sentinel (producer's bounded retries
                    # can expire while the consumer stalls minutes in an XLA
                    # compile): drained queue + dead producer == end of epoch
                    if not t.is_alive():
                        break
                    continue
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
            pool.shutdown(wait=False, cancel_futures=True)


def build_dataloader(dataset, batch_size=16, shuffle=True, workers=4, seed=0,
                     drop_last=True, pad_last=False):
    return DataLoader(dataset, batch_size=batch_size, shuffle=shuffle, workers=workers,
                      seed=seed, drop_last=drop_last, pad_last=pad_last)
