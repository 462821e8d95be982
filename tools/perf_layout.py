"""Layout-tax knock-out experiments for the ResDiff conv path on real TPU.

Question under test (PERF.md "Conv path"): the per-step decomposition leaves
~7-8 ms of elementwise/data-movement cost at C=32.  If XLA:TPU stores NHWC
activations with the channel (lane) dimension padded 32->128, every HBM
read/write of the trunk moves ~4x the useful bytes, and the fix is a layout
change (packed views / NCHW-ish minor dims), not more fusion.

Measurement rules per CLAUDE.md: each variant is ONE jitted `lax.scan` chain
long enough to dwarf the ~40 ms relay RPC latency, with fresh inputs per
repetition (the relay memoizes identical calls).

Run: python tools/perf_layout.py [--iters-scale N]
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def time_chain(fn, make_input, repeats=3):
    """fn: jitted (x)->y one-chain program. Returns seconds per call."""
    xs = [make_input(i) for i in range(repeats + 1)]
    out = fn(xs[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(1, repeats + 1):
        out = fn(xs[i])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeats


def elementwise_chain(shape, dtype, iters):
    """scan: y = y * 1.0001 + 0.01  (1 read + 1 write of `shape` per iter)."""

    def body(y, _):
        return y * jnp.asarray(1.0001, dtype) + jnp.asarray(0.01, dtype), None

    @jax.jit
    def chain(x):
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y

    def make(i):
        return jax.random.normal(jax.random.PRNGKey(i), shape, dtype)

    return chain, make


def exp_chain(shape, dtype, iters, use_exp2):
    """scan: y = exp(-(y*y)) — stable in (0, 1]; counts VPU transcendentals."""
    expf = jnp.exp2 if use_exp2 else jnp.exp

    def body(y, _):
        return expf(-(y * y)), None

    @jax.jit
    def chain(x):
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y

    def make(i):
        return jax.random.normal(jax.random.PRNGKey(i), shape, dtype)

    return chain, make


def conv_chain(shape, cout, ksize, dtype, iters):
    """scan: y = conv_k(y) with a fixed small weight (MXU conv throughput)."""
    cin = shape[-1]
    w = (
        jax.random.normal(jax.random.PRNGKey(7), (ksize, ksize, cin, cout), jnp.float32)
        * 0.05
    ).astype(dtype)

    def body(y, _):
        y = jax.lax.conv_general_dilated(
            y, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return y, None

    @jax.jit
    def chain(x):
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y

    def make(i):
        return jax.random.normal(jax.random.PRNGKey(i), shape, dtype)

    return chain, make


def groupnorm_chain(shape, groups, dtype, iters):
    """scan: y = groupnorm(y) * 1.0001 + 0.001 (keeps values sane)."""
    c = shape[-1]

    def gn(y):
        b = y.shape[0]
        g = y.reshape(b, -1, groups, c // groups)
        mu = jnp.mean(g.astype(jnp.float32), axis=(1, 3), keepdims=True)
        var = jnp.var(g.astype(jnp.float32), axis=(1, 3), keepdims=True)
        out = (g.astype(jnp.float32) - mu) * jax.lax.rsqrt(var + 1e-5)
        return out.astype(dtype).reshape(shape)

    def body(y, _):
        return gn(y) * jnp.asarray(1.0001, dtype) + jnp.asarray(0.001, dtype), None

    @jax.jit
    def chain(x):
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y

    def make(i):
        return jax.random.normal(jax.random.PRNGKey(i), shape, dtype)

    return chain, make


def report(name, sec_per_call, iters, nbytes_per_iter=None, flops_per_iter=None):
    ms = sec_per_call / iters * 1e3
    extra = ""
    if nbytes_per_iter:
        gbps = nbytes_per_iter / (sec_per_call / iters) / 1e9
        extra += f"  eff-BW {gbps:7.1f} GB/s"
    if flops_per_iter:
        tf = flops_per_iter / (sec_per_call / iters) / 1e12
        extra += f"  {tf:6.2f} TFLOP/s"
    print(f"{name:<46s} {ms:8.4f} ms/iter{extra}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters-scale", type=float, default=1.0)
    args = ap.parse_args()

    dt = jnp.bfloat16
    print(f"backend={jax.default_backend()} devices={jax.local_device_count()}", flush=True)

    # --- 1. Elementwise HBM chains: is C=32 lane-padded in HBM? -------------
    # All shapes below except where noted hold the SAME 16.78M elements
    # (33.5 MB bf16): if C=32 carries a 4x padding tax, (…,32) will run ~4x
    # slower than the packed 2D view and the C=128 shape (4x the elements)
    # will take the SAME wall time as C=32.
    base = 8 * 256 * 256 * 32
    cases = [
        ("ew NHWC C=32   (8,256,256,32)", (8, 256, 256, 32), 1.0),
        ("ew NHWC C=8    (8,256,256,8)", (8, 256, 256, 8), 0.25),
        ("ew NHWC C=128  (8,256,256,128)", (8, 256, 256, 128), 4.0),
        ("ew packed2D    (8,2048,1024)", (8, 2048, 1024), 1.0),
        ("ew packedWC    (8,256,8192)", (8, 256, 8192), 1.0),
        ("ew NCHW-ish    (8,32,256,256)", (8, 32, 256, 256), 1.0),
    ]
    for name, shape, rel in cases:
        n = int(np.prod(shape))
        iters = max(64, int(4000 * args.iters_scale * base / max(n, 1)))
        chain, make = elementwise_chain(shape, dt, iters)
        sec = time_chain(chain, make)
        report(name, sec, iters, nbytes_per_iter=2 * n * 2)  # r+w, bf16

    # --- 2. GroupNorm(16) at the trunk shape vs packed ----------------------
    for name, shape, groups in [
        ("gn16 NHWC C=32 (8,256,256,32)", (8, 256, 256, 32), 16),
        ("gn16 NHWC C=128 (8,128,128,128)", (8, 128, 128, 128), 16),
    ]:
        n = int(np.prod(shape))
        iters = max(32, int(1000 * args.iters_scale * base / max(n, 1)))
        chain, make = groupnorm_chain(shape, groups, dt, iters)
        sec = time_chain(chain, make)
        report(name, sec, iters, nbytes_per_iter=2 * n * 2)

    # --- 3. Conv MXU efficiency at the trunk channel counts -----------------
    conv_cases = [
        ("conv3x3 32->32 @256^2", (8, 256, 256, 32), 32, 3),
        ("conv3x3 64->64 @128^2", (8, 128, 128, 64), 64, 3),
        ("conv3x3 128->128 @64^2", (8, 64, 64, 128), 128, 3),
        ("conv1x1 32->32 @256^2", (8, 256, 256, 32), 32, 1),
    ]
    for name, shape, cout, ks in conv_cases:
        b, h, w, cin = shape
        flops = 2 * b * h * w * cin * cout * ks * ks
        iters = max(32, int(600 * args.iters_scale))
        chain, make = conv_chain(shape, cout, ks, dt, iters)
        sec = time_chain(chain, make)
        report(name, sec, iters, flops_per_iter=flops)

    # --- 4. VPU exp rate: exp vs exp2, fp32 vs bf16 --------------------------
    # The 128^2 attention site computes ~2.1G exponentials per sampler step.
    shape = (8, 2048, 1024)  # 16.8M elements
    for name, dtype, use2 in [
        ("exp  fp32 (8,2048,1024)", jnp.float32, False),
        ("exp2 fp32 (8,2048,1024)", jnp.float32, True),
        ("exp  bf16 (8,2048,1024)", jnp.bfloat16, False),
        ("exp2 bf16 (8,2048,1024)", jnp.bfloat16, True),
    ]:
        iters = max(64, int(800 * args.iters_scale))
        chain, make = exp_chain(shape, dtype, iters, use2)
        sec = time_chain(chain, make)
        n = int(np.prod(shape))
        per_iter = sec / iters
        print(
            f"{name:<46s} {per_iter*1e3:8.4f} ms/iter  "
            f"{n / per_iter / 1e9:6.2f} Gexp/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
