"""Device->host download strategies through the axon tunnel.

The volume driver's end-to-end gap vs the chain rate is dominated by the
result download (PERF.md round-12 trace: 16.7 MB bf16 at ~10 MB/s while
uploads run ~4x faster).  This rig A/Bs fetch strategies on a chain-shaped
result array [G=16, B=8, 256, 256, 1] bf16:

  single    — one np.asarray(sr) (the current _fetch)
  threads-K — K threads each fetching a contiguous chunk sr[i:j]
  crop      — device-side center crop to 220x220 before the fetch
              (the restack crops host-side anyway; 0.74x bytes)

Fresh random host inputs per repetition (relay memoizes (program, args)
executions across sessions; transfers sit behind an executed identity
program so inputs must vary).

Run: PYTHONPATH=/root/repo python tools/perf_fetch.py
"""
from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

RNG = np.random.default_rng(time.time_ns() % 2**31)
SHAPE = (16, 8, 256, 256, 1)


def _fresh_device_array():
    host = RNG.random(SHAPE, dtype=np.float32)
    x = jnp.asarray(host, jnp.bfloat16)
    # run a trivial program so the buffer is a computed result (like sr)
    y = jax.jit(lambda a: a + jnp.bfloat16(0))(x)
    y.block_until_ready()
    return y


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    nbytes = int(np.prod(SHAPE)) * 2
    reps = 3

    def timed(tag, fn):
        for r in range(reps):
            y = _fresh_device_array()
            t0 = time.perf_counter()
            out = fn(y)
            dt = time.perf_counter() - t0
            mb = out.nbytes / 1e6 if hasattr(out, "nbytes") else nbytes / 1e6
            print(
                f"fetch[{tag}] rep{r}: {dt:6.3f} s  ({mb / dt:7.2f} MB/s host-side)",
                flush=True,
            )

    timed("single", lambda y: np.asarray(y))

    def chunked(k):
        def run(y):
            bounds = np.linspace(0, SHAPE[0], k + 1, dtype=int)
            with ThreadPoolExecutor(max_workers=k) as ex:
                parts = list(
                    ex.map(lambda ij: np.asarray(y[ij[0] : ij[1]]),
                           zip(bounds[:-1], bounds[1:]))
                )
            return np.concatenate(parts)

        return run

    for k in (2, 4, 8):
        timed(f"threads-{k}", chunked(k))

    crop = jax.jit(lambda a: a[:, :, 18:238, 18:238, :])

    def crop_fetch(y):
        z = crop(y)
        z.block_until_ready()
        return np.asarray(z)

    timed("crop", crop_fetch)


if __name__ == "__main__":
    main()
