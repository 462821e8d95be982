"""ControlNet for the SD1.5 UNet, native Flax/NHWC.

The reference conditions SR sampling on the pixel-space LR image through
diffusers' ``ControlNetModel`` (``src/adapters/res_srdiff.py:65-70``):
ControlNet(latents, t, text, cond_image) -> per-scale down residuals + one
mid residual, added into the UNet skips.  Same design natively: a copy of
the UNet's down+mid tower, a small conv embedding for the condition image,
and zero-initialised 1x1 output convs so training starts as an identity.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from mrisr_tpu.models.sd_layers import TimestepEmbedding, Timesteps
from mrisr_tpu.models.sd_unet import CrossAttnDownBlock, DownBlock, MidBlock

_zero_init = nn.initializers.zeros


class ControlNetConditioningEmbedding(nn.Module):
    """Condition-image encoder: 3ch full-res -> 320ch at latent res (/8)."""

    out_channels: int = 320
    block_channels: Sequence[int] = (16, 32, 96, 256)

    @nn.compact
    def __call__(self, cond: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.block_channels[0], (3, 3), padding="SAME", name="conv_in")(cond)
        h = nn.silu(h)
        for i in range(len(self.block_channels) - 1):
            h = nn.Conv(self.block_channels[i], (3, 3), padding="SAME", name=f"blocks_{2*i}")(h)
            h = nn.silu(h)
            h = nn.Conv(
                self.block_channels[i + 1],
                (3, 3),
                strides=(2, 2),
                padding=((1, 1), (1, 1)),
                name=f"blocks_{2*i+1}",
            )(h)
            h = nn.silu(h)
        return nn.Conv(
            self.out_channels, (3, 3), padding="SAME", kernel_init=_zero_init, name="conv_out"
        )(h)


class ControlNet(nn.Module):
    in_channels: int = 4
    cond_channels: int = 3
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    heads: int = 8
    context_dim: int = 768
    conditioning_scale: float = 1.0
    # Condition-encoder pyramid; len-1 stride-2 stages must bring the pixel
    # condition down to the LATENT resolution (SD1.5: f=8 -> 3 stages).  A
    # phantom-scale f=4 VAE (eval/parity.py::run_phantom_latent) passes a
    # 3-entry pyramid here.
    cond_block_channels: Sequence[int] = (16, 32, 96, 256)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, h, w, 4] latents
        t: jnp.ndarray,  # [B]
        context: jnp.ndarray,  # [B, 77, 768]
        cond_image: jnp.ndarray | None = None,  # [B, 8h, 8w, 3] pixel condition
        cond_embedding: jnp.ndarray | None = None,  # precomputed embedding
    ):
        """Either ``cond_image`` (embedded here) or ``cond_embedding`` (the
        K-step sampler precomputes it ONCE per chain — the condition image
        is step-invariant, so embedding it inside the ``lax.scan`` body
        would re-run the full-resolution conv pyramid every step; PERF.md
        round-13, same pattern as ``ResDiffUNet.compute_static``)."""
        ch = self.block_out_channels
        temb = Timesteps(ch[0], name="time_proj")(t)
        # cast so a bf16 forward is not promoted to fp32 by the fp32 encoding
        temb = TimestepEmbedding(ch[0] * 4, name="time_embedding")(temb).astype(x.dtype)

        h = nn.Conv(ch[0], (3, 3), padding="SAME", name="conv_in")(x)
        if cond_embedding is None:
            cond_embedding = ControlNetConditioningEmbedding(
                ch[0], self.cond_block_channels, name="controlnet_cond_embedding"
            )(cond_image)
        h = h + cond_embedding

        skips = [h]
        for i, c in enumerate(ch):
            is_last = i == len(ch) - 1
            if not is_last:
                h, res = CrossAttnDownBlock(
                    c, self.heads, self.layers_per_block, True, self.context_dim,
                    name=f"down_blocks_{i}",
                )(h, temb, context)
            else:
                h, res = DownBlock(c, self.layers_per_block, False, name=f"down_blocks_{i}")(h, temb)
            skips.extend(res)

        h = MidBlock(ch[-1], self.heads, self.context_dim, name="mid_block")(h, temb, context)

        down_res = [
            nn.Conv(s.shape[-1], (1, 1), kernel_init=_zero_init, name=f"controlnet_down_blocks_{i}")(s)
            * self.conditioning_scale
            for i, s in enumerate(skips)
        ]
        mid_res = (
            nn.Conv(h.shape[-1], (1, 1), kernel_init=_zero_init, name="controlnet_mid_block")(h)
            * self.conditioning_scale
        )
        return down_res, mid_res


def embed_condition(cn: ControlNet, cn_params, cond_image: jnp.ndarray) -> jnp.ndarray:
    """Run ONLY the condition-image embedding pyramid (for per-chain
    precompute: the embedding is step-invariant, so the sampler computes it
    once and feeds ``cond_embedding=`` to every scan step).

    ``ControlNet`` is a compact module (one method), so the sub-tower is
    applied directly on its own param subtree — the 1:1 diffusers naming
    (``controlnet_cond_embedding``) makes the slice stable.
    """
    sub = cn_params["params"]["controlnet_cond_embedding"]
    return ControlNetConditioningEmbedding(
        cn.block_out_channels[0], cn.cond_block_channels
    ).apply({"params": sub}, cond_image)
