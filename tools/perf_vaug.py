"""Measure the V_AUG flash-kernel variant (MXU-computed softmax denominator)
at the hot 128^2 attention site.

Measurement rig (hardened vs the CLAUDE.md rules after observing two more
relay artifacts this round):
* chains memoize ACROSS SESSIONS — any input value ever used before (e.g.
  the PRNGKey(0..3) inputs of tools/perf_layout2.py) returns instantly, so
  inputs are host-generated from a time_ns-seeded RNG;
* ``block_until_ready`` does NOT force remote execution — every timed call
  must MATERIALIZE a scalar of its output (float(jnp.sum(out))) inside the
  timed region;
* each variant is timed at TWO iteration counts and the reported number is
  the slope of the MEDIANS, which cancels the RPC/materialization overhead.

V_AUG appends a ones column to V so the PV matmul emits the running softmax
denominator in an accumulator lane the MXU pads anyway, removing the per-tile
VPU row-sum + scratch update from the kernel's inner loop.

Run: PYTHONPATH=/root/repo python tools/perf_vaug.py
"""
from __future__ import annotations

import functools
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

RNG = np.random.default_rng(time.time_ns() % 2**31)


def time_chain_slope(make_chain, shape, dt, iters_lo=50, iters_hi=200, repeats=4):
    """Median chain time at two iteration counts -> per-iter slope (seconds)."""
    meds = {}
    for iters in (iters_lo, iters_hi):
        fn = make_chain(iters)
        warm = [jnp.asarray(RNG.standard_normal(shape), dt) for _ in range(3)]
        out = fn(*warm)
        out.block_until_ready()
        float(jnp.sum(out.astype(jnp.float32)))  # drain the queue
        times = []
        for _ in range(repeats):
            xs = [jnp.asarray(RNG.standard_normal(shape), dt) for _ in range(3)]
            t0 = time.perf_counter()
            out = fn(*xs)
            # block_until_ready does NOT force remote execution through the
            # relay (measured this round); materialize a scalar instead.
            float(jnp.sum(out.astype(jnp.float32)))
            times.append(time.perf_counter() - t0)
        meds[iters] = statistics.median(times)
        print(
            f"    iters={iters}: times "
            + " ".join(f"{t*1e3:7.1f}" for t in times)
            + f" ms  median {meds[iters]*1e3:7.1f}",
            flush=True,
        )
    return (meds[iters_hi] - meds[iters_lo]) / (iters_hi - iters_lo)


def main():
    from mrisr_tpu.ops import flash_attention as fa

    dt = jnp.bfloat16
    print(f"backend={jax.default_backend()}", flush=True)
    shape = (8, 16384, 32)

    def make_chain(iters):
        f = functools.partial(
            fa.flash_attention_tpu, scale=0.1767767, block_q=2048, block_k=1024
        )

        @jax.jit
        def chain(q, k, v):
            def body(q_c, _):
                return f(q_c, k, v), None

            y, _ = jax.lax.scan(body, q, None, length=iters)
            return y

        return chain

    variants = [
        ("prescale_q (default)", {}),
        ("prescale_q + v_aug", {"V_AUG": True}),
    ]
    defaults = {k: getattr(fa, k) for k in ("PRESCALE_Q", "P_BF16", "EXP2", "V_AUG")}
    for name, flags in variants:
        for k, v in defaults.items():
            setattr(fa, k, v)
        for k, v in flags.items():
            setattr(fa, k, v)
        print(f"  {name}:", flush=True)
        per = time_chain_slope(make_chain, shape, dt)
        print(f"flash [8,16384,32] {name:<28s} {per*1e3:8.3f} ms/iter (slope)", flush=True)
    for k, v in defaults.items():
        setattr(fa, k, v)


if __name__ == "__main__":
    main()
