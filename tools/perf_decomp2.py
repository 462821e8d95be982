"""Per-site knock-out decomposition of the ResDiff step's "misc" bucket.

Round-4 left ~3.7 ms/step (25%) attributed only as "other convs/
elementwise" (PERF.md).  This rig names every millisecond: each variant
knocks out ONE site family, then times the full 50-step chain (bench.py
shape: 256^2, bs=8, bf16) with fresh host-random inputs per variant
(PERF.md round-4 measurement rules).  Timing-only probes — most knockouts
change the math.

Patching pattern: module CLASSES are replaced by flax subclasses with
their own @nn.compact __call__ (raw method swaps break flax scoping — the
replacement body would create submodules in the CALLER's scope).
Identity/function swaps (no submodule creation) stay plain.

Sites covered beyond tools/perf_decomp.py:
  * deep (level 1-3 + mid) 3x3 convs -> 1x1           (conv FLOPs off-s2d)
  * down/upsample convs -> 1x1                        (resample conv cost)
  * ResnetBlock channel-matching shortcut conv + add  (shortcut cost)
  * FiLM noise-embedding Dense + broadcast add        (emb injection)
  * all plain GroupNorms -> identity                  (off-s2d GN cost)
  * CA with attention op -> V passthrough             (CA projections vs kernel)
  * mid self-attention -> identity                    (mid-attn cost)
  * DDIM step math -> cheap axpy                      (sampler elementwise)
  * final ConvBlock -> channel slice                  (output head cost)

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/perf_decomp2.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
from flax import linen as nn

from perf_decomp import time_variant  # noqa: E402  (shared validated rig)


def main():
    from mrisr_tpu.diffusion import ddim as ddim_mod
    from mrisr_tpu.models import layers
    from mrisr_tpu.models import resdiff_unet as ru

    print(f"backend={jax.default_backend()}", flush=True)

    only = os.environ.get("MRISR_DECOMP2_ONLY", "")
    want = lambda name: (not only) or name in only.split(",")

    if want("full"):
        time_variant("full")

    # --- deep (non-s2d) ConvBlock 3x3 -> 1x1 (s2d/level-0 path unchanged) --
    if want("deep1x1"):

        class ConvBlock1x1(layers.ConvBlock):
            @nn.compact
            def __call__(self, x, deterministic=True):
                if self.s2d:
                    h = layers.SGroupNorm(self.groups, name="GroupNorm_0")(x)
                    h = nn.swish(h)
                    return layers.SpaceConv(self.features, 3, name="Conv_0")(h)
                h = nn.GroupNorm(
                    num_groups=self.groups, epsilon=layers.GN_EPS, name="GroupNorm_0"
                )(x)
                h = nn.swish(h)
                return nn.Conv(self.features, (1, 1), name="Conv_0")(h)

        orig = layers.ConvBlock
        layers.ConvBlock = ConvBlock1x1
        time_variant("deep convs 3x3->1x1")
        layers.ConvBlock = orig

    # --- down/upsample convs -> 1x1 (s2d paths unchanged) ------------------
    if want("updown1x1"):

        class Downsample1x1(layers.Downsample):
            @nn.compact
            def __call__(self, x):
                if self.s2d_io:
                    return layers._S2DToS2DConv(self.features, name="Conv_0")(x)
                if self.s2d_exit:
                    return layers._S2DExitConv(self.features, name="Conv_0")(x)
                return nn.Conv(self.features, (1, 1), strides=(2, 2), name="Conv_0")(x)

        class Upsample1x1(layers.Upsample):
            @nn.compact
            def __call__(self, x):
                if self.s2d_io:
                    return layers.SpaceConv(self.features, 3, name="Conv_0")(
                        layers.tile4(layers.depth_to_space(x))
                    )
                if self.s2d_entry:
                    return layers.SpaceConv(self.features, 3, name="Conv_0")(
                        layers.tile4(x)
                    )
                return nn.Conv(self.features, (1, 1), name="Conv_0")(
                    layers.nearest_up2(x)
                )

        odn, oup = ru.Downsample, ru.Upsample
        ru.Downsample, ru.Upsample = Downsample1x1, Upsample1x1
        time_variant("up/down convs 3x3->1x1")
        ru.Downsample, ru.Upsample = odn, oup

    # --- ResnetBlock shortcut conv + residual add --------------------------
    def _rb_variant(drop_shortcut=False, drop_film=False):
        class RB(layers.ResnetBlock):
            @nn.compact
            def __call__(self, x, emb=None, deterministic=True):
                if drop_film:
                    emb = None
                h = layers.ConvBlock(self.features, self.groups, s2d=self.s2d)(x)
                if emb is not None:
                    d = nn.Dense(self.features)(emb)
                    if self.s2d:
                        d = layers.tile4_vec(d)
                    h = h + d[:, None, None, :]
                h = layers.ConvBlock(
                    self.features, self.groups, self.dropout, s2d=self.s2d
                )(h, deterministic)
                in_ch = x.shape[-1] // 4 if self.s2d else x.shape[-1]
                if in_ch != self.features:
                    if drop_shortcut:
                        return h
                    if self.s2d:
                        x = layers.SpaceConv(self.features, 1, name="Conv_0")(x)
                    else:
                        x = nn.Conv(self.features, (1, 1), name="Conv_0")(x)
                return h + x

        return RB

    if want("noshort"):
        orig = layers.ResnetBlock
        layers.ResnetBlock = _rb_variant(drop_shortcut=True)
        time_variant("no shortcut conv (timing-only)")
        layers.ResnetBlock = orig

    # --- FiLM noise-embedding injection ------------------------------------
    if want("nofilm"):
        orig = layers.ResnetBlock
        layers.ResnetBlock = _rb_variant(drop_film=True)
        time_variant("no FiLM emb injection")
        layers.ResnetBlock = orig

    # --- all plain GroupNorms -> identity (no submodules created) ----------
    if want("noplaingn"):
        orig_gn = nn.GroupNorm.__call__
        nn.GroupNorm.__call__ = lambda self, x, **kw: x
        time_variant("no plain groupnorm")
        nn.GroupNorm.__call__ = orig_gn

    # --- CA attention kernel -> V passthrough (projections kept) -----------
    if want("capass"):
        orig_ca2d = layers.cross_attention_2d
        # Broadcast one V row to Q's token count: under MRISR_DECOMP_KV_POOL
        # the pooled V has fewer tokens than Q, so returning v directly would
        # shape-error at the output reshape (timing-only probe either way).
        layers.cross_attention_2d = lambda q, k, v, **kw: jnp.broadcast_to(
            v[:, :1, :], q.shape
        )
        time_variant("CA kernel -> V passthrough")
        layers.cross_attention_2d = orig_ca2d

    # --- mid self-attention (identity, no submodules) ----------------------
    if want("nomidattn"):
        orig_sa = layers.SelfAttention2D.__call__
        layers.SelfAttention2D.__call__ = lambda self, x: x
        time_variant("no mid self-attention")
        layers.SelfAttention2D.__call__ = orig_sa

    # --- DDIM step math -> cheap axpy ---------------------------------------
    if want("cheapddim"):
        orig_step = ddim_mod.ddim_step
        ddim_mod.ddim_step = lambda sched, x, tb, tpb, eps, key, eta, clip: x - 0.05 * eps
        time_variant("cheap ddim step (timing-only)")
        ddim_mod.ddim_step = orig_step

    # --- final ConvBlock -> channel slice -----------------------------------
    if want("nofinal"):

        class FinalSlice(nn.Module):
            features: int
            groups: int = 32
            dropout: float = 0.0
            s2d: bool = False

            @nn.compact
            def __call__(self, x, deterministic=True):
                c = self.features * 4 if self.s2d else self.features
                return x[..., :c]

        orig = ru.ConvBlock
        ru.ConvBlock = FinalSlice
        time_variant("no final conv block (timing-only)")
        ru.ConvBlock = orig


if __name__ == "__main__":
    main()
