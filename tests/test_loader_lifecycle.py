"""Loader worker-thread lifecycle (VERDICT round-2 weak-2 regression).

The reference's ``torch.utils.data.DataLoader(num_workers=2)`` owns worker
shutdown; our thread-prefetched Loader must match that: any consumer that
abandons iteration mid-epoch (the parity harness's step-bounded loops do
exactly this) must not leave the worker blocked in ``q.put`` forever.
"""
import threading
import time

import numpy as np
import pytest

from mrisr_tpu.data.loader import Loader


class _ToyDataset:
    def __init__(self, n=64):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((4, 4), float(i), np.float32)}


def _settle_threads(baseline, timeout=5.0):
    """Wait for thread count to return to baseline (worker polls at 100ms)."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        if threading.active_count() <= baseline:
            return True
        time.sleep(0.05)
    return False


def test_early_break_does_not_leak_worker_threads():
    baseline = threading.active_count()
    ds = _ToyDataset(256)
    loader = Loader(ds, batch_size=4, prefetch=2)
    # The parity-harness pattern: several epochs, each abandoned early.
    for _ in range(5):
        for i, b in enumerate(loader):
            assert b["x"].shape == (4, 4, 4)
            if i >= 2:
                break
    assert _settle_threads(baseline), (
        f"leaked loader worker threads: {threading.active_count()} alive "
        f"vs baseline {baseline}: "
        f"{[t.name for t in threading.enumerate()]}"
    )


def test_full_epoch_joins_worker():
    baseline = threading.active_count()
    loader = Loader(_ToyDataset(16), batch_size=4, prefetch=2)
    n = sum(1 for _ in loader)
    assert n == 4
    assert _settle_threads(baseline)


def test_dataset_error_propagates_and_cleans_up():
    class Bad(_ToyDataset):
        def __getitem__(self, i):
            if i >= 8:
                raise ValueError("corrupt sample")
            return super().__getitem__(i)

    baseline = threading.active_count()
    loader = Loader(Bad(32), batch_size=4, prefetch=2)
    with pytest.raises(ValueError, match="corrupt sample"):
        for _ in loader:
            pass
    assert _settle_threads(baseline)


def test_generator_close_stops_worker():
    baseline = threading.active_count()
    it = iter(Loader(_ToyDataset(256), batch_size=4, prefetch=2))
    next(it)
    it.close()
    assert _settle_threads(baseline)
