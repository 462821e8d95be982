"""Component microbenchmarks for the ResDiff sampler hot path on real TPU.

Inputs MUST differ per repeat: the axon remote-execution relay memoizes
identical (program, args) calls, so repeating the same arrays measures
enqueue latency, not compute.
Run: python tools/perf_micro.py
"""
import functools
import time

import jax
import jax.numpy as jnp


def timeit(fn, make_args, repeats=8, warmup=1):
    args_list = [make_args(i) for i in range(repeats + warmup)]
    for i in range(warmup):
        out = fn(*args_list[i])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(warmup, warmup + repeats):
        out = fn(*args_list[i])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeats


def main():
    from mrisr_tpu.models.resdiff_unet import ResDiffUNet
    from mrisr_tpu.ops.attention import dense_attention, chunked_attention
    from mrisr_tpu.ops.flash_attention import flash_attention_tpu

    dtype = jnp.bfloat16
    B = 8

    def qkv(n, d):
        def make(i):
            k = jax.random.PRNGKey(i)
            x = jax.random.normal(k, (3, B, n, d), dtype)
            return x[0], x[1], x[2]
        return make

    print("== CA0 shape [8, 16384, 32] ==", flush=True)
    for bq, bk in [(512, 512), (1024, 1024), (2048, 1024)]:
        f = jax.jit(functools.partial(flash_attention_tpu, scale=0.177, block_q=bq, block_k=bk))
        print(f"flash bq={bq} bk={bk}: {timeit(f, qkv(16384, 32))*1e3:.2f} ms", flush=True)
    f = jax.jit(lambda q, k, v: chunked_attention(q, k, v, 0.177))
    print(f"chunked lax.scan: {timeit(f, qkv(16384, 32))*1e3:.2f} ms", flush=True)

    print("== CA1 shape [8, 4096, 64] ==", flush=True)
    f = jax.jit(functools.partial(flash_attention_tpu, scale=0.125, block_q=512, block_k=512))
    print(f"flash 512/512: {timeit(f, qkv(4096, 64))*1e3:.2f} ms", flush=True)
    f = jax.jit(lambda q, k, v: dense_attention(q, k, v, 0.125))
    print(f"dense: {timeit(f, qkv(4096, 64))*1e3:.2f} ms", flush=True)

    print("== full UNet single forward (bs=8, 256^2) ==", flush=True)
    unet = ResDiffUNet(image_size=256)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (B, 256, 256, 2), dtype)
    gamma = jnp.full((B,), 0.5, dtype)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(dtype), unet.init(key, x0[:1], gamma[:1])
    )
    static0 = unet.apply(params, x0[..., 0:1], method="compute_static")
    static0 = jax.tree_util.tree_map(lambda a: a.astype(dtype), static0)

    def make_x(i):
        return (jax.random.normal(jax.random.PRNGKey(100 + i), (B, 256, 256, 2), dtype),)

    fwd = jax.jit(lambda x: unet.apply(params, x, gamma, static=static0))
    print(f"UNet fwd (static hoisted): {timeit(fwd, make_x)*1e3:.2f} ms", flush=True)
    fwd_inline = jax.jit(lambda x: unet.apply(params, x, gamma))
    print(f"UNet fwd (inline FD/DWT):  {timeit(fwd_inline, make_x)*1e3:.2f} ms", flush=True)
    st = jax.jit(lambda x: unet.apply(params, x[..., 0:1], method="compute_static"))
    print(f"compute_static alone:      {timeit(st, make_x)*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
