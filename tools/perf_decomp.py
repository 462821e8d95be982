"""Knock-out decomposition of the ResDiff sampler step (round-4 state).

Times the full 50-step chain (bench.py shape: 256^2, bs=8, bf16) with model
pieces knocked out by monkeypatching the layer classes before init — each
variant is one fresh jitted program, timed with fresh host-random inputs
and a drain fetch (PERF.md round-4 measurement rules; the relay memoizes
previously-seen (program, values) pairs across sessions and
block_until_ready alone is only sound for top-level pipeline calls).
Params differ per variant (fewer modules); that's fine for throughput
probes.  Some knockouts change the math (plain concat for concat_s2d,
1x1-for-3x3 convs) — timing-only probes, never correctness.

Run: PYTHONPATH=/root/repo python tools/perf_decomp.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

RNG = np.random.default_rng(time.time_ns() % 2**31)

# CPU smoke-testing of the knockout patches: MRISR_DECOMP_SIZE=64
# MRISR_DECOMP_STEPS=2 MRISR_DECOMP_REPEATS=1 JAX_PLATFORMS=cpu (the
# sitecustomize honors jax.config only, so set it below too).
import os as _os

_SIZE = int(_os.environ.get("MRISR_DECOMP_SIZE", "256"))
_STEPS = int(_os.environ.get("MRISR_DECOMP_STEPS", "50"))
_REPEATS = int(_os.environ.get("MRISR_DECOMP_REPEATS", "4"))
if _os.environ.get("MRISR_DECOMP_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")


def build_pipe(size=_SIZE, dtype=jnp.bfloat16):
    from mrisr_tpu.diffusion.schedules import resdiff_schedule
    from mrisr_tpu.models.resdiff_unet import ResDiffUNet
    from mrisr_tpu.models.simple_cnn import SimpleCNN
    from mrisr_tpu.pipelines.resdiff import ResDiffPipeline

    cnn = SimpleCNN()
    # MRISR_DECOMP_KV_POOL >= 2 runs every variant under the fast serving
    # profile (K/V pooled at the big CA sites) so the fast profile's
    # residual budget decomposes the same way the exact one did.
    kv_pool = int(_os.environ.get("MRISR_DECOMP_KV_POOL", "0"))
    unet = ResDiffUNet(image_size=size, ca_kv_pool=kv_pool)
    lr = jnp.asarray(RNG.standard_normal((8, size, size, 1)), dtype)
    cnn_params = cnn.init(jax.random.PRNGKey(0), lr)
    unet_params = unet.init(
        jax.random.PRNGKey(1), jnp.zeros((1, size, size, 2), dtype), jnp.array([0.5])
    )
    cast = lambda t: jax.tree_util.tree_map(lambda x: x.astype(dtype), t)
    return (
        ResDiffPipeline(cnn, unet, resdiff_schedule(1000), cast(cnn_params), cast(unet_params)),
        lr.shape,
        dtype,
    )


def time_variant(label, steps=_STEPS, repeats=_REPEATS):
    pipe, shape, dtype = build_pipe()

    def fresh():
        return (jnp.asarray(RNG.standard_normal(shape), dtype),
                jax.random.PRNGKey(int(RNG.integers(2**30))))

    lr, k = fresh()
    out = pipe.super_resolve(lr, k, num_steps=steps)
    out.block_until_ready()
    np.asarray(out[0, 0, 0, 0])
    ins = [fresh() for _ in range(repeats)]
    t0 = time.perf_counter()
    for lr, k in ins:
        out = pipe.super_resolve(lr, k, num_steps=steps)
    out.block_until_ready()
    np.asarray(out[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / repeats
    print(
        f"{label:<34s} chain {dt*1e3:8.1f} ms  per-step {dt/steps*1e3:6.2f} ms  "
        f"slices/s {8/dt:6.3f}",
        flush=True,
    )
    return dt


def main():
    from mrisr_tpu.models import layers
    from mrisr_tpu.models import resdiff_unet as ru
    from mrisr_tpu.ops import space_to_depth as s2d_ops

    print(f"backend={jax.default_backend()}", flush=True)

    import os

    # MRISR_DECOMP_ONLY=full,noca,level0,concat,nosgn,nonoise selects a
    # subset (every variant pays its own 10-15 min relay compile).
    only = os.environ.get("MRISR_DECOMP_ONLY", "")
    want = lambda name: (not only) or name in only.split(",")

    if os.environ.get("MRISR_DECOMP_SKIP_BASE", "0") != "1":
        if want("full"):
            time_variant("full")

        if want("noca"):
            orig_ca = layers.HFGuidedCrossAttention.__call__
            layers.HFGuidedCrossAttention.__call__ = (
                lambda self, x, q, s2d=False, io_s2d=False, kv_pool=0: x
            )
            time_variant("no cross-attention")
            layers.HFGuidedCrossAttention.__call__ = orig_ca

    # --- level-0 conv FLOPs: SpaceConv 3x3 -> 1x1 (layouts unchanged) ------
    import flax.linen as nn

    orig_sc = layers.SpaceConv

    class SpaceConv1x1(layers.SpaceConv):
        @nn.compact
        def __call__(self, y):
            cin = y.shape[-1] // 4
            kernel = self.param(
                "kernel",
                nn.initializers.lecun_normal(),
                (self.kernel_size, self.kernel_size, cin, self.features),
            )
            bias = (
                self.param("bias", nn.initializers.zeros_init(), (self.features,))
                if self.use_bias
                else None
            )
            k1 = kernel[:1, :1] if self.kernel_size > 1 else kernel
            return s2d_ops.s2d_conv(y, k1.astype(y.dtype), bias)

    if want("level0"):
        layers.SpaceConv = SpaceConv1x1
        ru.SpaceConv = SpaceConv1x1
        time_variant("level-0 convs 3x3->1x1")
        layers.SpaceConv = orig_sc
        ru.SpaceConv = orig_sc

    # --- concat_s2d order-preserving reshapes vs plain concat (timing-only)
    if want("concat"):
        orig_cc = s2d_ops.concat_s2d
        plain_cc = lambda *ts: jnp.concatenate(ts, axis=-1)
        s2d_ops.concat_s2d = plain_cc
        layers.concat_s2d = plain_cc
        ru.concat_s2d = plain_cc
        import mrisr_tpu.pipelines.resdiff as rp

        rp.concat_s2d = plain_cc
        time_variant("plain concat (timing-only)")
        s2d_ops.concat_s2d = orig_cc
        layers.concat_s2d = orig_cc
        ru.concat_s2d = orig_cc
        rp.concat_s2d = orig_cc

    # --- s2d GroupNorm -----------------------------------------------------
    if want("nosgn"):
        orig_gn = layers.SGroupNorm.__call__
        layers.SGroupNorm.__call__ = lambda self, y, fuse_silu=False: y
        time_variant("no s2d groupnorm")
        layers.SGroupNorm.__call__ = orig_gn

    # --- FD splitter per-step noise branch ---------------------------------
    if want("nonoise"):
        orig_fd = ru.FDInfoSpliter._call_s2d

        def fd_cheap(self, x, noise_emb, static):
            cnn_x = x[..., 0::2]
            xt = x[..., 1::2]
            x_lf, x_hf = static
            return s2d_ops.concat_s2d(xt, cnn_x, xt, x_lf, x_hf)

        ru.FDInfoSpliter._call_s2d = fd_cheap
        time_variant("no per-step noise branch")
        ru.FDInfoSpliter._call_s2d = orig_fd


if __name__ == "__main__" and not __import__("os").environ.get("MRISR_DECOMP_KERNEL_PROBE"):
    main()


def probe_kernel_build():
    """Timing-only: replace s2d_conv_kernel's 36 scatter-updates with a cheap
    same-shape tile+pad (wrong math).  Measures whether XLA hoists the
    per-step weight scattering out of the scan body or re-executes it."""
    from mrisr_tpu.ops import space_to_depth as s2d_ops
    import mrisr_tpu.ops.space_to_depth as mod

    orig = s2d_ops.s2d_conv_kernel

    def cheap(w):
        ks, _, cin, cout = w.shape
        ref = orig(jnp.zeros((ks, ks, 1, 1), w.dtype))  # shape/ks2 probe (tiny)
        ks2 = ref.shape[0]
        t = jnp.tile(w, (1, 1, 4, 4))
        pad = ks2 - ks
        if pad > 0:
            t = jnp.pad(t, ((0, pad), (0, pad), (0, 0), (0, 0)))
        else:
            t = t[:ks2, :ks2]
        return t

    mod.s2d_conv_kernel = cheap
    time_variant("cheap s2d kernel build (timing-only)")
    mod.s2d_conv_kernel = orig


if __name__ == "__main__" and __import__("os").environ.get("MRISR_DECOMP_KERNEL_PROBE"):
    probe_kernel_build()
