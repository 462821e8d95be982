"""AutoencoderKL (SD1.5 VAE), native Flax/NHWC.

The reference VAE-encodes the LR condition and decodes sampled latents
(``src/adapters/res_srdiff.py:50,110``) through diffusers' frozen SD1.5
AutoencoderKL.  Same architecture natively: 4-stage encoder/decoder with
(128, 256, 512, 512) channels, 2 (enc) / 3 (dec) resnets per stage,
single-head mid attention, diagonal-Gaussian posterior, scaling factor
0.18215.

Module names follow the diffusers state-dict scheme 1:1
(``encoder.down_blocks.{i}.resnets.{j}``, ``downsamplers.0``, ``mid_block``,
``decoder.up_blocks.{i}.upsamplers.0`` ...) so
``models/convert.py::convert_vae`` lands pretrained torch checkpoints onto
this tree without any renaming; coverage is pinned by
tests/test_convert_coverage.py.  GroupNorm eps is 1e-6 throughout (the
diffusers VAE convention; the UNet uses 1e-5).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mrisr_tpu.models.sd_layers import (
    gn_groups,
    Downsample2D,
    ResnetBlock2D,
    Upsample2D,
    VAEAttention,
)

SD15_SCALING_FACTOR = 0.18215
_VAE_EPS = 1e-6


class DownEncoderBlock(nn.Module):
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for j in range(self.num_layers):
            x = ResnetBlock2D(
                self.out_channels, eps=_VAE_EPS, use_temb=False, name=f"resnets_{j}"
            )(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, name="downsamplers_0")(x)
        return x


class UpDecoderBlock(nn.Module):
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for j in range(self.num_layers):
            x = ResnetBlock2D(
                self.out_channels, eps=_VAE_EPS, use_temb=False, name=f"resnets_{j}"
            )(x)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, name="upsamplers_0")(x)
        return x


class VAEMidBlock(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = ResnetBlock2D(self.channels, eps=_VAE_EPS, use_temb=False, name="resnets_0")(x)
        x = VAEAttention(name="attentions_0")(x)
        return ResnetBlock2D(self.channels, eps=_VAE_EPS, use_temb=False, name="resnets_1")(x)


class Encoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ch = self.block_out_channels
        h = nn.Conv(ch[0], (3, 3), padding="SAME", name="conv_in")(x)
        for i, c in enumerate(ch):
            h = DownEncoderBlock(
                c, self.layers_per_block, add_downsample=i != len(ch) - 1,
                name=f"down_blocks_{i}",
            )(h)
        h = VAEMidBlock(ch[-1], name="mid_block")(h)
        h = nn.GroupNorm(
            num_groups=gn_groups(h.shape[-1]), epsilon=_VAE_EPS, name="conv_norm_out"
        )(h)
        h = nn.silu(h)
        return nn.Conv(2 * self.latent_channels, (3, 3), padding="SAME", name="conv_out")(h)


class Decoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 3
    out_channels: int = 3

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        ch = list(reversed(self.block_out_channels))  # (512, 512, 256, 128)
        h = nn.Conv(ch[0], (3, 3), padding="SAME", name="conv_in")(z)
        h = VAEMidBlock(ch[0], name="mid_block")(h)
        for i, c in enumerate(ch):
            h = UpDecoderBlock(
                c, self.layers_per_block, add_upsample=i != len(ch) - 1,
                name=f"up_blocks_{i}",
            )(h)
        h = nn.GroupNorm(
            num_groups=gn_groups(h.shape[-1]), epsilon=_VAE_EPS, name="conv_norm_out"
        )(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME", name="conv_out")(h)


class AutoencoderKL(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    latent_channels: int = 4
    in_channels: int = 3
    scaling_factor: float = SD15_SCALING_FACTOR

    def setup(self):
        self.encoder = Encoder(self.block_out_channels, 2, self.latent_channels)
        self.decoder = Decoder(self.block_out_channels, 3, self.in_channels)
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1), name="quant_conv")
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1), name="post_quant_conv")

    def encode_moments(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        h = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(h, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x: jnp.ndarray, key: jax.Array | None = None) -> jnp.ndarray:
        """Sample (or take the mean of) the diagonal-Gaussian posterior."""
        mean, logvar = self.encode_moments(x)
        if key is None:
            return mean
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(key, mean.shape, mean.dtype)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray, key: jax.Array | None = None) -> jnp.ndarray:
        return self.decode(self.encode(x, key))
