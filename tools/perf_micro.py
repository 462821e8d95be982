"""Component microbenchmarks for the ResDiff sampler hot path on real TPU.

Answers: where do the ~38ms/step (bs=8, 256^2, bf16) go?
Run: python tools/perf_micro.py
"""
import functools
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, repeats=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeats


def main():
    import numpy as np

    from mrisr_tpu.models.resdiff_unet import ResDiffUNet
    from mrisr_tpu.ops.attention import dense_attention, chunked_attention
    from mrisr_tpu.ops.flash_attention import flash_attention_tpu

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    B = 8

    print("== flash attention CA0 shape [8, 16384, 32] ==")
    q = jax.random.normal(key, (B, 16384, 32), dtype)
    k = jax.random.normal(key, (B, 16384, 32), dtype)
    v = jax.random.normal(key, (B, 16384, 32), dtype)
    for bq, bk in [(512, 512), (1024, 1024), (2048, 512), (512, 2048), (1024, 2048), (2048, 1024)]:
        f = jax.jit(functools.partial(flash_attention_tpu, scale=0.177, block_q=bq, block_k=bk))
        dt = timeit(f, q, k, v)
        print(f"flash bq={bq} bk={bk}: {dt*1e3:.2f} ms")
    f = jax.jit(lambda q, k, v: chunked_attention(q, k, v, 0.177))
    print(f"chunked lax.scan: {timeit(f, q, k, v)*1e3:.2f} ms")

    print("== flash attention CA1 shape [8, 4096, 64] ==")
    q1 = jax.random.normal(key, (B, 4096, 64), dtype)
    f = jax.jit(functools.partial(flash_attention_tpu, scale=0.125, block_q=512, block_k=512))
    print(f"flash 512/512: {timeit(f, q1, q1, q1)*1e3:.2f} ms")
    f = jax.jit(lambda q, k, v: dense_attention(q, k, v, 0.125))
    print(f"dense: {timeit(f, q1, q1, q1)*1e3:.2f} ms")

    print("== full UNet single forward (bs=8, 256^2) ==")
    unet = ResDiffUNet(image_size=256)
    x = jax.random.normal(key, (B, 256, 256, 2), dtype)
    gamma = jnp.full((B,), 0.5, dtype)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(dtype), unet.init(key, x[:1], gamma[:1])
    )
    static = unet.apply(params, x[..., 0:1], method="compute_static")
    static = jax.tree_util.tree_map(lambda a: a.astype(dtype), static)

    fwd = jax.jit(lambda p, x, g, s: unet.apply(p, x, g, static=s))
    print(f"UNet fwd (static hoisted): {timeit(fwd, params, x, gamma, static)*1e3:.2f} ms")
    fwd_inline = jax.jit(lambda p, x, g: unet.apply(p, x, g))
    print(f"UNet fwd (inline FD/DWT):  {timeit(fwd_inline, params, x, gamma)*1e3:.2f} ms")

    static_fn = jax.jit(lambda p, c: unet.apply(p, c, method="compute_static"))
    print(f"compute_static alone:      {timeit(static_fn, params, x[..., 0:1])*1e3:.2f} ms")


if __name__ == "__main__":
    main()
