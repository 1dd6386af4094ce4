"""Threaded prefetching batch loader.

Replaces the reference's torch ``DataLoader(num_workers=2..32)``
(``/root/reference/datasets/dataset_coco.py:471-476``). Worker threads run the
cv2/PIL preprocessing (which releases the GIL) and a bounded queue overlaps
host-side augmentation with device steps. Batches are dict-of-arrays with
fixed shapes, ready for ``jax.device_put`` / ``shard_batch``.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np


class PrefetchLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, seed: int = 0, drop_last: bool = True,
                 prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self._epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            # fresh augmentation stream per epoch (flip / multi-scale picks)
            self.dataset.set_epoch(epoch)

    def _index_batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for i in range(0, stop, self.batch_size):
            yield order[i:i + self.batch_size]

    def __iter__(self) -> Iterator[dict]:
        batches = list(self._index_batches())
        task_q: "queue.Queue" = queue.Queue()
        for bi, idxs in enumerate(batches):
            task_q.put((bi, idxs))
        results = {}
        errors = []
        lock = threading.Lock()
        stop_event = threading.Event()
        # Backpressure: bound in-flight + undelivered batches so a slow
        # consumer can't make workers materialize the whole epoch into RAM.
        # Slots are acquired BEFORE pulling a task, so slot holders are always
        # the earliest pending batches — the consumer's next batch is always
        # among them and the pipeline can't deadlock.
        slots = threading.Semaphore(max(self.prefetch, self.num_workers))
        self._peak_outstanding = 0  # test/diagnostic hook

        def worker():
            while not stop_event.is_set():
                if not slots.acquire(timeout=0.1):
                    continue
                try:
                    bi, idxs = task_q.get_nowait()
                except queue.Empty:
                    slots.release()
                    return
                try:
                    samples = [self.dataset[int(i)] for i in idxs]
                    batch = {
                        k: np.stack([s[k] for s in samples])
                        for k in samples[0]
                    }
                except Exception as exc:  # propagate instead of hanging
                    with lock:
                        errors.append(exc)
                    stop_event.set()
                    return
                with lock:
                    results[bi] = batch
                    self._peak_outstanding = max(self._peak_outstanding,
                                                 len(results))

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        try:
            next_bi = 0
            import time
            while next_bi < len(batches):
                with lock:
                    if errors:
                        raise errors[0]
                    batch = results.pop(next_bi, None)
                if batch is None:
                    time.sleep(0.002)
                    continue
                slots.release()
                yield batch
                next_bi += 1
        finally:
            stop_event.set()
