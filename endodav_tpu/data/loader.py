"""Minimal batching loader with background prefetch.

Replaces `torch.utils.data.DataLoader(num_workers=4, pin_memory=True)`
(trainer_end_to_end_video.py:178-188) with a thread-prefetched numpy
collator: the host assembles the next batch while the TPU runs the
current step, and `jax.device_put` overlaps the transfer.
"""

from __future__ import annotations

import queue
import threading

import numpy as np

__all__ = ["Loader", "readlines"]


def readlines(path: str) -> list[str]:
    with open(path) as f:
        return f.read().splitlines()


def _collate(items: list[dict]) -> dict:
    out = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals, axis=0)
        else:
            out[key] = np.asarray(vals)
    return out


class Loader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = True, seed: int = 314, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
            if not (self.drop_last and i + self.batch_size > len(order))
        ]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                for idxs in batches:
                    if stop.is_set():
                        return
                    q.put(_collate([self.dataset[int(i)] for i in idxs]))
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()
