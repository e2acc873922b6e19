"""Batching loader with a deterministic multi-thread prefetch pool.

Replaces `torch.utils.data.DataLoader(num_workers=4, pin_memory=True)`
(trainer_end_to_end_video.py:178-188): `num_workers` threads decode and
collate batches concurrently while the TPU runs the current step, and
`jax.device_put` overlaps the transfer.  Unlike the torch loader,
batch order AND sampling are deterministic for any worker count
(per-item rngs in the dataset, ordered emission here).
"""

from __future__ import annotations

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
    """Batches are emitted in deterministic order regardless of worker
    count: `num_workers` threads decode/collate concurrently (PNG/TIFF
    decode releases the GIL in cv2/imageio) and a sequencer reorders
    their outputs.  Datasets exposing an `epoch` attribute get it bumped
    every epoch so per-item rngs resample across epochs."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = True, seed: int = 314, prefetch: int = 2,
                 num_workers: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        self.num_workers = max(1, int(num_workers))
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        if hasattr(self.dataset, "epoch"):
            self.dataset.epoch = self._epoch
        self._epoch += 1
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
            if not (self.drop_last and i + self.batch_size > len(order))
        ]
        if not batches:
            return

        stop = threading.Event()
        n_workers = min(self.num_workers, len(batches))
        # bounded output buffer: workers stall once prefetch batches are
        # waiting, so memory stays O(prefetch + num_workers) batches
        results: dict[int, dict] = {}
        lock = threading.Lock()
        ready = threading.Condition(lock)
        next_job = [0]
        max_pending = self.prefetch + n_workers

        def worker():
            while not stop.is_set():
                with lock:
                    while len(results) >= max_pending and not stop.is_set():
                        ready.wait(0.1)
                    job = next_job[0]
                    if job >= len(batches):
                        return
                    next_job[0] = job + 1
                batch = _collate([self.dataset[int(i)] for i in batches[job]])
                with ready:
                    results[job] = batch
                    ready.notify_all()

        threads = [threading.Thread(target=worker, daemon=True) for _ in range(n_workers)]
        for t in threads:
            t.start()
        try:
            for j in range(len(batches)):
                with ready:
                    while j not in results:
                        ready.wait()
                    batch = results.pop(j)
                    ready.notify_all()
                yield batch
        finally:
            stop.set()
            with ready:
                ready.notify_all()
