"""Isolate the non-UNet sampler overhead + batch scaling (round 3).

Probe 1: the 50-step DDIM chain with the denoiser replaced by identity —
everything left is the sampler's own elementwise math on the s2d carry
(C=4 tensors), RNG, and scan plumbing.

Probe 2: the full pipeline at bs=16 (post-s2d MXU packing may change the
batch-scaling picture vs the round-2 flat result).

Run: PYTHONPATH=/root/repo python tools/perf_sampler_overhead.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

RNG = np.random.default_rng(time.time_ns() % 2**31)


def main():
    from mrisr_tpu.diffusion.schedules import resdiff_schedule
    from mrisr_tpu.pipelines.sampler import sr3_ancestral_sample

    print(f"backend={jax.default_backend()}", flush=True)
    sched = resdiff_schedule(1000)
    steps = 50

    # --- probe 1: dummy denoiser, s2d-shaped carry --------------------------
    @jax.jit
    def chain(x_T, key):
        return sr3_ancestral_sample(
            sched, lambda x, g: x, x_T, key, num_steps=steps
        )

    shape = (8, 128, 128, 4)  # the io_s2d carry at 256^2
    xs = [jnp.asarray(RNG.standard_normal(shape), jnp.bfloat16) for i in range(7)]
    ks = [jax.random.PRNGKey(int(RNG.integers(2**30))) for _ in range(7)]
    out = chain(xs[0], ks[0])
    out.block_until_ready()
    np.asarray(out[0, 0, 0, 0])
    t0 = time.perf_counter()
    for i in range(1, 7):
        out = chain(xs[i], ks[i])
    out.block_until_ready()
    np.asarray(out[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / 6
    print(f"sampler-only (dummy eps, s2d carry): {dt*1e3:7.1f} ms chain, "
          f"{dt/steps*1e3:5.2f} ms/step", flush=True)

    # --- probe 2: full pipeline at bs=16 ------------------------------------
    from mrisr_tpu.models.resdiff_unet import ResDiffUNet
    from mrisr_tpu.models.simple_cnn import SimpleCNN
    from mrisr_tpu.pipelines.resdiff import ResDiffPipeline

    dtype = jnp.bfloat16
    cnn = SimpleCNN()
    unet = ResDiffUNet(image_size=256)
    lr16 = jnp.asarray(RNG.standard_normal((16, 256, 256, 1)), dtype)
    cnn_params = cnn.init(jax.random.PRNGKey(2), lr16)
    unet_params = unet.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 256, 256, 2), dtype), jnp.array([0.5])
    )
    cast = lambda t: jax.tree_util.tree_map(lambda x: x.astype(dtype), t)
    pipe = ResDiffPipeline(cnn, unet, sched, cast(cnn_params), cast(unet_params))
    out = pipe.super_resolve(lr16, jax.random.PRNGKey(int(RNG.integers(2**30))), num_steps=steps)
    out.block_until_ready()
    np.asarray(out[0, 0, 0, 0])
    ins16 = [(jnp.asarray(RNG.standard_normal((16, 256, 256, 1)), dtype),
              jax.random.PRNGKey(int(RNG.integers(2**30)))) for _ in range(3)]
    t0 = time.perf_counter()
    for lr_i, k_i in ins16:
        out = pipe.super_resolve(lr_i, k_i, num_steps=steps)
    out.block_until_ready()
    np.asarray(out[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / 3
    print(f"full pipeline bs=16: {dt*1e3:7.1f} ms chain, {dt/steps*1e3:5.2f} ms/step, "
          f"{16/dt:6.3f} slices/s", flush=True)


if __name__ == "__main__":
    main()
