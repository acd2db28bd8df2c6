"""Threaded prefetching data loader.

Replaces the reference's torch DataLoader (pin_memory + prefetch_factor,
``datamodule.py:174-205``): worker threads run the dataset's decode path
(which releases the GIL inside the native libav decoder) and assembled
batches are prefetched into a bounded queue so host IO overlaps device
compute.
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Callable, Iterator, Optional, Sequence

__all__ = ["DataLoader"]


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        num_workers: int = 4,
        prefetch_factor: int = 2,
        collate_fn: Optional[Callable] = None,
        drop_last: bool = False,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(num_workers, 1)
        self.prefetch = max(prefetch_factor, 1)
        self.collate_fn = collate_fn or (lambda x: x)
        self.drop_last = drop_last
        self.seed = seed
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self) -> list[list[int]]:
        idxs = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self._epoch).shuffle(idxs)
        batches = [
            idxs[i : i + self.batch_size] for i in range(0, len(idxs), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __iter__(self) -> Iterator:
        batches = self._batches()
        self._epoch += 1
        if not batches:
            return
        out_q: "queue.Queue" = queue.Queue(maxsize=self.num_workers * self.prefetch)
        task_q: "queue.Queue" = queue.Queue()
        for i, b in enumerate(batches):
            task_q.put((i, b))
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                try:
                    i, idx_list = task_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    samples = [self.dataset[j] for j in idx_list]
                    out_q.put((i, self.collate_fn(samples)))
                except Exception as e:  # noqa: BLE001
                    out_q.put((i, e))

        threads = [
            threading.Thread(target=worker, daemon=True) for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        # in-order delivery
        pending: dict[int, object] = {}
        next_idx = 0
        try:
            while next_idx < len(batches):
                while next_idx not in pending:
                    i, item = out_q.get()
                    pending[i] = item
                item = pending.pop(next_idx)
                next_idx += 1
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
