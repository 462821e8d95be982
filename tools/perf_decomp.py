"""Knock-out decomposition of the ResDiff sampler step (round-3 state).

Times the full 50-step chain (bench.py shape: 256^2, bs=8, bf16) with model
pieces knocked out by monkeypatching the layer classes before init — each
variant is one fresh jitted program with fresh inputs per repetition
(CLAUDE.md measurement rules).  Params differ per variant (fewer modules);
that's fine for throughput probes.

Run: PYTHONPATH=/root/repo python tools/perf_decomp.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def build_pipe(size=256, dtype=jnp.bfloat16):
    from mrisr_tpu.diffusion.schedules import resdiff_schedule
    from mrisr_tpu.models.resdiff_unet import ResDiffUNet
    from mrisr_tpu.models.simple_cnn import SimpleCNN
    from mrisr_tpu.pipelines.resdiff import ResDiffPipeline

    key = jax.random.PRNGKey(0)
    cnn = SimpleCNN()
    unet = ResDiffUNet(image_size=size)
    lr = jnp.zeros((8, size, size, 1), dtype)
    cnn_params = cnn.init(key, lr)
    unet_params = unet.init(
        jax.random.PRNGKey(1), jnp.zeros((1, size, size, 2), dtype), jnp.array([0.5])
    )
    cast = lambda t: jax.tree_util.tree_map(lambda x: x.astype(dtype), t)
    return (
        ResDiffPipeline(cnn, unet, resdiff_schedule(1000), cast(cnn_params), cast(unet_params)),
        lr,
    )


def time_variant(label, steps=50, repeats=3):
    pipe, lr = build_pipe()
    k = jax.random.PRNGKey(7)
    out = pipe.super_resolve(lr, k, num_steps=steps)
    out.block_until_ready()
    t0 = time.perf_counter()
    for i in range(repeats):
        out = pipe.super_resolve(lr, jax.random.fold_in(k, i), num_steps=steps)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / repeats
    print(
        f"{label:<28s} chain {dt*1e3:8.1f} ms  per-step {dt/steps*1e3:6.2f} ms  "
        f"slices/s {8/dt:6.3f}",
        flush=True,
    )
    return dt


def main():
    from mrisr_tpu.models import layers

    print(f"backend={jax.default_backend()}", flush=True)

    # full model (current defaults)
    time_variant("full")

    # knock out HF-guided cross-attention (skips become plain downsampled h)
    orig_ca = layers.HFGuidedCrossAttention.__call__
    layers.HFGuidedCrossAttention.__call__ = lambda self, x, q: x
    time_variant("no cross-attention")

    # additionally knock out mid self-attention
    orig_sa = layers.SelfAttention2D.__call__
    layers.SelfAttention2D.__call__ = lambda self, x: x
    time_variant("no attention at all")

    # restore CA, keep self-attn off (isolates mid block)
    layers.HFGuidedCrossAttention.__call__ = orig_ca
    time_variant("no mid self-attn only")
    layers.SelfAttention2D.__call__ = orig_sa

    # knock out GroupNorm in s2d blocks (isolate SGroupNorm cost)
    orig_gn = layers.SGroupNorm.__call__
    layers.SGroupNorm.__call__ = lambda self, y: y
    time_variant("no s2d groupnorm")
    layers.SGroupNorm.__call__ = orig_gn

    # knock out the FD splitter per-step noise branch (keep static concat)
    from mrisr_tpu.models import resdiff_unet as ru

    orig_fd = ru.FDInfoSpliter._call_s2d

    def fd_cheap(self, x, noise_emb, static):
        cnn_x = x[..., 0::2]
        xt = x[..., 1::2]
        x_lf, x_hf = static
        from mrisr_tpu.ops.space_to_depth import concat_s2d

        return concat_s2d(xt, cnn_x, xt, x_lf, x_hf)

    ru.FDInfoSpliter._call_s2d = fd_cheap
    time_variant("no per-step noise branch")
    ru.FDInfoSpliter._call_s2d = orig_fd


if __name__ == "__main__":
    main()
