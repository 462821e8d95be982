"""Round-3 follow-up knock-outs: space-to-depth conv equivalents + fixed
elementwise chains (perf_layout.py's affine chains were strength-reduced by
XLA — every body here is nonlinear or data-moving so the loop must execute).

Validates the plan: rewrite the ResDiff UNet's 256^2 C=32 stage to run on
space-to-depth (128^2, C=128) tensors, where conv3x3 measured 140 TFLOP/s
vs 10.9 at C=32 (tools/perf_layout.py run, PERF.md round 3).

Run: python tools/perf_layout2.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def time_chain(fn, make_input, repeats=3):
    xs = [make_input(i) for i in range(repeats + 1)]
    out = fn(xs[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(1, repeats + 1):
        out = fn(xs[i])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeats


def scan_chain(body, iters):
    @jax.jit
    def chain(x):
        y, _ = jax.lax.scan(lambda c, _: (body(c), None), x, None, length=iters)
        return y

    return chain


def normal_input(shape, dtype):
    return lambda i: jax.random.normal(jax.random.PRNGKey(i), shape, dtype)


def report(name, sec, iters, nbytes=None, flops=None):
    per = sec / iters
    extra = ""
    if nbytes:
        extra += f"  eff-BW {nbytes / per / 1e9:7.1f} GB/s"
    if flops:
        extra += f"  {flops / per / 1e12:6.2f} TFLOP/s"
    print(f"{name:<50s} {per*1e3:8.4f} ms/iter{extra}", flush=True)


def main():
    dt = jnp.bfloat16
    print(f"backend={jax.default_backend()}", flush=True)

    # NOTE: pure-elementwise and GN-only scan chains measure as ~0 ms/iter on
    # this stack (XLA keeps the carry resident / collapses the loop) — they
    # are not listed; only chains with convs/attention give trustworthy times.

    # --- the s2d conv workhorse sizes ----------------------------------------
    def conv_body(w, stride=1):
        def body(y):
            return jax.lax.conv_general_dilated(
                y, w, (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return body

    # cin != cout cases scan over a PAIR (cin->cout->cin); report per-pair.
    conv_cases = [
        ("conv3x3 128->128 @128^2 (s2d 32->32@256^2)", (8, 128, 128, 128), 128, 3),
        ("conv3x3 pair 256<->128 @128^2 (s2d up-block)", (8, 128, 128, 256), 128, 3),
        ("conv3x3 pair 20<->128  @128^2 (s2d conv_in)", (8, 128, 128, 20), 128, 3),
        ("conv1x1 pair 256<->128 @128^2 (s2d shortcut)", (8, 128, 128, 256), 128, 1),
        ("conv3x3 pair 64<->32 @256^2 (plain up-block)", (8, 256, 256, 64), 32, 3),
        ("conv3x3 pair 5<->32  @256^2 (plain conv_in)", (8, 256, 256, 5), 32, 3),
    ]
    for name, shape, cout, ks in conv_cases:
        b, h, w_, cin = shape
        wa = (
            jax.random.normal(jax.random.PRNGKey(5), (ks, ks, cin, cout), jnp.float32)
            * (0.5 / np.sqrt(ks * ks * cin))
        ).astype(dt)
        flops = 2 * b * h * w_ * cin * cout * ks * ks
        iters = 300
        if cin == cout:
            chain = scan_chain(conv_body(wa), iters)
        else:
            wb = (
                jax.random.normal(jax.random.PRNGKey(6), (ks, ks, cout, cin), jnp.float32)
                * (0.5 / np.sqrt(ks * ks * cout))
            ).astype(dt)
            fa, fb = conv_body(wa), conv_body(wb)
            chain = scan_chain(lambda y: fb(fa(y)), iters)
            flops *= 2
        sec = time_chain(chain, normal_input(shape, dt))
        report(name, sec, iters, flops=flops)

    # --- s2d / d2s transform cost (chain alternates to stay nonfoldable) ----
    def s2d(y):  # (B,H,W,C) -> (B,H/2,W/2,4C), (u,v) major
        b, h, w, c = y.shape
        y = y.reshape(b, h // 2, 2, w // 2, 2, c)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)

    def d2s(y):
        b, h, w, c4 = y.shape
        c = c4 // 4
        y = y.reshape(b, h, w, 2, 2, c)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)

    # Interleave a tiny conv so the s2d/d2s pair can't cancel or fold away.
    wgt1 = (jnp.eye(128)[None, None] * 0.999).astype(dt)  # 1x1 near-identity
    iters = 300
    chain = scan_chain(
        lambda y: d2s(
            jax.lax.conv_general_dilated(
                s2d(y), wgt1, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        ),
        iters,
    )
    shape = (8, 256, 256, 32)
    sec = time_chain(chain, normal_input(shape, dt))
    report("s2d -> 1x1(128) -> d2s (8,256,256,32)", sec, iters,
           nbytes=2 * int(np.prod(shape)) * 2)

    # --- flash attention VPU-variant sweep at the hot site -------------------
    # Module flags are read at trace time, so set them per variant and retrace.
    import functools
    from mrisr_tpu.ops import flash_attention as fa

    def qkv(n, d):
        def make(i):
            x = jax.random.normal(jax.random.PRNGKey(i), (3, 8, n, d), dt)
            return x

        return make

    def attn_chain(iters):
        f = functools.partial(
            fa.flash_attention_tpu, scale=0.1767767, block_q=2048, block_k=1024
        )

        @jax.jit
        def chain(qkv_in):
            q, k, v = qkv_in[0], qkv_in[1], qkv_in[2]

            def body(q_c, _):
                o = f(q_c, k, v)
                return o, None

            y, _ = jax.lax.scan(body, q, None, length=iters)
            return y

        return chain

    variants = [
        ("baseline", {}),
        ("prescale_q", {"PRESCALE_Q": True}),
        ("p_bf16", {"P_BF16": True}),
        ("exp2", {"EXP2": True}),
        ("prescale+p_bf16", {"PRESCALE_Q": True, "P_BF16": True}),
        ("prescale+p_bf16+exp2", {"PRESCALE_Q": True, "P_BF16": True, "EXP2": True}),
    ]
    defaults = {k: getattr(fa, k) for k in ("PRESCALE_Q", "P_BF16", "EXP2", "FAST_EXP")}
    iters = 30
    for name, flags in variants:
        for k, v in defaults.items():
            setattr(fa, k, v)
        for k, v in flags.items():
            setattr(fa, k, v)
        sec = time_chain(attn_chain(iters), qkv(16384, 32))
        report(f"flash [8,16384,32] {name}", sec, iters)
    for k, v in defaults.items():
        setattr(fa, k, v)


if __name__ == "__main__":
    main()
