"""Headline benchmark: ResDiff SR throughput, 50-step DDIM chain at 256x256.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: BASELINE.json target of 20 slices/sec/chip (the reference itself
publishes no throughput numbers — SURVEY.md §6).

The whole two-stage pipeline (SimpleCNN + ResDiff UNet x 50 steps) runs as
one jitted lax.scan program in bfloat16 on the available accelerator.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cpu-smoke", action="store_true", help="tiny CPU smoke run")
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument("--profile", default=None, help="write a jax.profiler trace here")
    args = ap.parse_args()

    import jax

    if args.cpu_smoke:
        jax.config.update("jax_platforms", "cpu")
        args.batch, args.size, args.steps, args.repeats = 1, 64, 4, 1

    import jax.numpy as jnp

    from mrisr_tpu.diffusion.schedules import resdiff_schedule
    from mrisr_tpu.models.resdiff_unet import ResDiffUNet
    from mrisr_tpu.models.simple_cnn import SimpleCNN
    from mrisr_tpu.pipelines.resdiff import ResDiffPipeline

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    key = jax.random.PRNGKey(0)

    cnn = SimpleCNN()
    unet = ResDiffUNet(image_size=args.size)
    sched = resdiff_schedule(1000)

    lr = jnp.zeros((args.batch, args.size, args.size, 1), dtype)
    k1, k2, k3 = jax.random.split(key, 3)
    cnn_params = cnn.init(k1, lr)
    unet_params = unet.init(k2, jnp.zeros((1, args.size, args.size, 2), dtype), jnp.array([0.5]))
    cast = lambda t: jax.tree_util.tree_map(lambda x: x.astype(dtype), t)
    pipe = ResDiffPipeline(cnn, unet, sched, cast(cnn_params), cast(unet_params))

    # Warmup / compile
    out = pipe.super_resolve(lr, k3, num_steps=args.steps)
    out.block_until_ready()

    if args.profile:
        from mrisr_tpu.utils.profiling import trace

        with trace(args.profile):
            out = pipe.super_resolve(lr, jax.random.fold_in(k3, 99), num_steps=args.steps)
            out.block_until_ready()

    t0 = time.perf_counter()
    for i in range(args.repeats):
        out = pipe.super_resolve(lr, jax.random.fold_in(k3, i), num_steps=args.steps)
    out.block_until_ready()
    elapsed = time.perf_counter() - t0

    n_chips = jax.local_device_count()
    slices_per_sec_per_chip = args.batch * args.repeats / elapsed / n_chips
    print(
        json.dumps(
            {
                "metric": f"ResDiff SR slices/sec/chip ({args.steps}-step DDIM {args.size}x{args.size}, bs={args.batch}, {args.dtype})",
                "value": round(float(slices_per_sec_per_chip), 3),
                "unit": "slices/sec/chip",
                "vs_baseline": round(float(slices_per_sec_per_chip) / 20.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
