"""Profiling & timing harness (SURVEY.md §5: tracing/profiling was absent
in the reference; this provides the jax.profiler trace + block_until_ready
timing for the slices/sec/chip north-star).
"""
from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir: str | Path):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, warmup: int = 1, repeats: int = 3, **kw):
    """Return (result, seconds/call) with block_until_ready fencing."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) / repeats


def throughput(fn, batch_size: int, *args, **kw) -> float:
    """items/sec/chip for a batched call."""
    _, sec = timed(fn, *args, **kw)
    return batch_size / sec / jax.local_device_count()
