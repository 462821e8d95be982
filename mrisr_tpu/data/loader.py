"""Minimal batching loader with optional background prefetch + mesh sharding.

Replaces ``torch.utils.data.DataLoader(num_workers=2)`` usage in the
reference with a thread-prefetched iterator that stacks numpy dicts and can
device-put batches with dim-0 ``NamedSharding`` so host->device transfer
overlaps compute (SURVEY.md §7: device-resident, mesh-sharded batches).
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Iterator

import numpy as np


def _stack(samples: list[dict]) -> dict:
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], (np.ndarray, np.generic, float, int)):
            out[k] = np.stack([np.asarray(v) for v in vals])
        else:
            out[k] = vals  # strings etc.
    return out


class Loader:
    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 2,
        mesh=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.mesh = mesh
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_batches(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        stop = n - n % self.batch_size if self.drop_last else n
        for s in range(0, stop, self.batch_size):
            yield idx[s : s + self.batch_size]

    def __iter__(self) -> Iterator[dict]:
        self._epoch += 1
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        # Datasets exposing a vectorised get_batch (e.g. the native C++
        # SliceCacheDataset's multithreaded mmap gather) skip the per-item
        # Python loop + stack entirely.
        fast = getattr(self.dataset, "get_batch", None)

        def worker():
            try:
                for batch_idx in self._index_batches():
                    if fast is not None:
                        q.put(fast(batch_idx))
                    else:
                        samples = [self.dataset[int(i)] for i in batch_idx]
                        q.put(_stack(samples))
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if self.mesh is not None:
                from mrisr_tpu.parallel.mesh import shard_batch

                arrays = {k: v for k, v in item.items() if isinstance(v, np.ndarray)}
                others = {k: v for k, v in item.items() if not isinstance(v, np.ndarray)}
                item = {**shard_batch(self.mesh, arrays), **others}
            yield item
