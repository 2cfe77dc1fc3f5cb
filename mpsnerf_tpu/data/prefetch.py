"""Background-thread item prefetching — the DataLoader-workers equivalent.

The reference overlaps host-side data prep (image IO, undistortion, ray
sampling) with GPU compute via ``DataLoader(num_workers=16)``
(run_nerf_batch.py:455).  Here a small thread pool keeps a queue of ready
items ahead of the jitted train step.

Determinism: indices are drawn from a seeded sampler under a lock and
tagged with sequence numbers; the consumer REORDERS completed items by
sequence, so two identically-seeded runs consume the exact same item
stream regardless of worker-thread races (torch's DataLoader makes the
same guarantee).

Multi-host: the default sampler implements ``DistributedSampler`` +
``set_epoch`` semantics (ref run_nerf_batch.py:452-453,525-526) — every
epoch a permutation seeded by (seed, epoch) identically on all hosts is
sliced ``process_index::process_count``, so hosts consume disjoint items
and reshuffle together each epoch.
"""

from __future__ import annotations

import heapq
import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np


class PrefetchLoader:
    """Iterates ``dataset[i]`` for sampled indices with lookahead.

    Args:
      dataset: anything with ``__len__`` and ``__getitem__``.
      sampler: callable rng -> index; defaults to uniform.
      num_workers: producer threads (0 = synchronous passthrough).
      prefetch: queue depth.
    """

    def __init__(
        self,
        dataset,
        seed: int = 0,
        num_workers: int = 2,
        prefetch: int = 4,
        sampler: Optional[Callable] = None,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.dataset = dataset
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.num_workers = num_workers
        self.prefetch = prefetch
        if process_index is None or process_count is None:
            try:
                import jax

                process_index = jax.process_index()
                process_count = jax.process_count()
            except Exception:
                process_index, process_count = 0, 1
        self.process_index = int(process_index)
        self.process_count = max(1, int(process_count))
        self._epoch = 0
        self._epoch_indices: list = []
        self.sampler = sampler or self._distributed_sampler
        self._queue: "queue.Queue" = queue.Queue(maxsize=max(1, prefetch))
        self._stop = threading.Event()
        self._index_lock = threading.Lock()
        self._seq = 0
        self._next_out = 0
        self._reorder: list = []  # heap of (seq, item)
        self._threads = []
        if num_workers > 0:
            for _ in range(num_workers):
                t = threading.Thread(target=self._worker, daemon=True)
                t.start()
                self._threads.append(t)

    def _distributed_sampler(self, rng) -> int:
        """Next index of this host's slice of the current epoch permutation.

        The permutation is seeded by (seed, epoch) — identical on every
        host — then sliced per host; called under ``_index_lock``.
        """
        if not self._epoch_indices:
            g = np.random.default_rng((self.seed, self._epoch))
            perm = g.permutation(len(self.dataset))
            sliced = perm[self.process_index::self.process_count]
            if len(sliced) == 0:  # more hosts than items: fall back
                sliced = perm
            self._epoch_indices = list(sliced[::-1])  # pop() from the front
            self._epoch += 1
        return int(self._epoch_indices.pop())

    def _draw(self):
        with self._index_lock:
            seq = self._seq
            self._seq += 1
            return seq, self.sampler(self.rng)

    def _worker(self) -> None:
        while not self._stop.is_set():
            seq, idx = self._draw()
            try:
                item = self.dataset[idx]
            except Exception as e:  # surface errors on the consumer side
                item = e
            while not self._stop.is_set():
                try:
                    self._queue.put((seq, item), timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        if self.num_workers == 0:
            return self.dataset[self._draw()[1]]
        # deliver strictly in sequence order
        while True:
            if self._reorder and self._reorder[0][0] == self._next_out:
                _, item = heapq.heappop(self._reorder)
                self._next_out += 1
                if isinstance(item, Exception):
                    raise item
                return item
            seq, item = self._queue.get()
            # seq values are unique, so the item is never compared
            heapq.heappush(self._reorder, (seq, item))

    def close(self) -> None:
        self._stop.set()
