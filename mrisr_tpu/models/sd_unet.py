"""SD1.5-class conditional UNet (UNet2DConditionModel), native Flax/NHWC.

The reference drives HF diffusers' ``UNet2DConditionModel`` for the latent
LoRA/ControlNet path (``src/adapters/res_srdiff.py:73-78``).  This is the
same architecture rebuilt natively: 4 down / 1 mid / 4 up blocks, channels
(320, 640, 1280, 1280), 2 resnets per block, 8-head cross-attention to a
768-d text context, and diffusers residual hookups so ControlNet residuals
(`down_block_additional_residuals` / ``mid_block_additional_residual``) and
T2I-Adapter features add in at the documented points.

Weights convert 1:1 from diffusers checkpoints via models/convert.py.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from mrisr_tpu.models.sd_layers import (
    gn_groups,
    Downsample2D,
    ResnetBlock2D,
    TimestepEmbedding,
    Timesteps,
    Transformer2D,
    Upsample2D,
)


class CrossAttnDownBlock(nn.Module):
    out_channels: int
    heads: int
    layers: int = 2
    add_downsample: bool = True
    context_dim: int = 768

    @nn.compact
    def __call__(self, x, temb, context, adapter_feat=None):
        residuals = []
        for i in range(self.layers):
            x = ResnetBlock2D(self.out_channels, name=f"resnets_{i}")(x, temb)
            x = Transformer2D(self.heads, context_dim=self.context_dim, name=f"attentions_{i}")(
                x, context
            )
            if adapter_feat is not None and i == self.layers - 1:
                x = x + adapter_feat
            residuals.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, name="downsamplers_0")(x)
            residuals.append(x)
        return x, residuals


class DownBlock(nn.Module):
    out_channels: int
    layers: int = 2
    add_downsample: bool = False

    @nn.compact
    def __call__(self, x, temb, adapter_feat=None):
        residuals = []
        for i in range(self.layers):
            x = ResnetBlock2D(self.out_channels, name=f"resnets_{i}")(x, temb)
            if adapter_feat is not None and i == self.layers - 1:
                x = x + adapter_feat
            residuals.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, name="downsamplers_0")(x)
            residuals.append(x)
        return x, residuals


class MidBlock(nn.Module):
    channels: int
    heads: int
    context_dim: int = 768

    @nn.compact
    def __call__(self, x, temb, context):
        x = ResnetBlock2D(self.channels, name="resnets_0")(x, temb)
        x = Transformer2D(self.heads, context_dim=self.context_dim, name="attentions_0")(x, context)
        x = ResnetBlock2D(self.channels, name="resnets_1")(x, temb)
        return x


class UpBlock(nn.Module):
    out_channels: int
    layers: int = 3
    add_upsample: bool = True

    @nn.compact
    def __call__(self, x, skips, temb):
        for i in range(self.layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock2D(self.out_channels, name=f"resnets_{i}")(x, temb)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, name="upsamplers_0")(x)
        return x


class CrossAttnUpBlock(nn.Module):
    out_channels: int
    heads: int
    layers: int = 3
    add_upsample: bool = True
    context_dim: int = 768

    @nn.compact
    def __call__(self, x, skips, temb, context):
        for i in range(self.layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock2D(self.out_channels, name=f"resnets_{i}")(x, temb)
            x = Transformer2D(self.heads, context_dim=self.context_dim, name=f"attentions_{i}")(
                x, context
            )
        if self.add_upsample:
            x = Upsample2D(self.out_channels, name="upsamplers_0")(x)
        return x


class SDUNet(nn.Module):
    """UNet2DConditionModel (SD1.5 configuration by default)."""

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    heads: int = 8
    context_dim: int = 768

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, H, W, C] latents
        t: jnp.ndarray,  # [B] timesteps
        context: jnp.ndarray,  # [B, 77, 768] text embeddings
        down_block_additional_residuals: Optional[list] = None,
        mid_block_additional_residual: Optional[jnp.ndarray] = None,
        adapter_features: Optional[list] = None,
    ) -> jnp.ndarray:
        ch = self.block_out_channels
        temb = Timesteps(ch[0], name="time_proj")(t)
        # cast so a bf16 forward is not promoted to fp32 by the fp32 encoding
        temb = TimestepEmbedding(ch[0] * 4, name="time_embedding")(temb).astype(x.dtype)

        h = nn.Conv(ch[0], (3, 3), padding="SAME", name="conv_in")(x)
        skips = [h]
        af = adapter_features or [None] * len(ch)

        for i, c in enumerate(ch):
            is_last = i == len(ch) - 1
            if not is_last:
                h, res = CrossAttnDownBlock(
                    c, self.heads, self.layers_per_block, True, self.context_dim,
                    name=f"down_blocks_{i}",
                )(h, temb, context, af[i])
            else:
                h, res = DownBlock(c, self.layers_per_block, False, name=f"down_blocks_{i}")(
                    h, temb, af[i]
                )
            skips.extend(res)

        if down_block_additional_residuals is not None:
            skips = [s + r for s, r in zip(skips, down_block_additional_residuals)]

        h = MidBlock(ch[-1], self.heads, self.context_dim, name="mid_block")(h, temb, context)
        if mid_block_additional_residual is not None:
            h = h + mid_block_additional_residual

        rev = list(reversed(ch))  # (1280, 1280, 640, 320)
        for i, c in enumerate(rev):
            is_last = i == len(rev) - 1
            if i == 0:
                h = UpBlock(c, self.layers_per_block + 1, not is_last, name=f"up_blocks_{i}")(
                    h, skips, temb
                )
            else:
                h = CrossAttnUpBlock(
                    c, self.heads, self.layers_per_block + 1, not is_last, self.context_dim,
                    name=f"up_blocks_{i}",
                )(h, skips, temb, context)

        h = nn.GroupNorm(num_groups=gn_groups(ch[0]), epsilon=1e-5, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME", name="conv_out")(h)
