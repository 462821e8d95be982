"""Stable-Diffusion-1.5-class building blocks (diffusers-compatible math).

Native Flax/NHWC implementations of the blocks the reference reaches through
HF diffusers (``UNet2DConditionModel``, ``AutoencoderKL``, ``ControlNetModel``
— imports at ``ResDif_execution.ipynb`` cell 4, used in
``src/adapters/res_srdiff.py``).  Numerics follow the diffusers conventions
(GroupNorm(32, eps 1e-5/1e-6), SiLU, GEGLU feed-forward, 8-head attention
with head_dim = channels/8) so converted torch weights reproduce outputs.
Attention routes through ops/attention.py (chunked/flash on TPU).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mrisr_tpu.ops.attention import spatial_attention, dense_attention


def gn_groups(channels: int, groups: int = 32) -> int:
    """32 groups at real SD sizes; gcd fallback so tiny test configs work."""
    return groups if channels % groups == 0 else math.gcd(channels, groups)


class Timesteps(nn.Module):
    """Diffusers sinusoidal timestep projection (flip_sin_to_cos=True)."""

    dim: int
    flip_sin_to_cos: bool = True
    downscale_freq_shift: float = 0.0

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half = self.dim // 2
        exponent = -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32)
        exponent = exponent / (half - self.downscale_freq_shift)
        emb = jnp.exp(exponent)
        emb = t.astype(jnp.float32)[:, None] * emb[None, :]
        sin, cos = jnp.sin(emb), jnp.cos(emb)
        if self.flip_sin_to_cos:
            return jnp.concatenate([cos, sin], axis=-1)
        return jnp.concatenate([sin, cos], axis=-1)


class TimestepEmbedding(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.dim, name="linear_1")(x)
        x = nn.silu(x)
        return nn.Dense(self.dim, name="linear_2")(x)


class ResnetBlock2D(nn.Module):
    """Diffusers ResnetBlock2D: GN-SiLU-conv x2 with temb injection."""

    out_channels: int
    groups: int = 32
    eps: float = 1e-5
    use_temb: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h = nn.GroupNorm(num_groups=gn_groups(x.shape[-1], self.groups), epsilon=self.eps, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", name="conv1")(h)
        if temb is not None and self.use_temb:
            t = nn.Dense(self.out_channels, name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = nn.GroupNorm(num_groups=gn_groups(self.out_channels, self.groups), epsilon=self.eps, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut")(x)
        return x + h


class Attention(nn.Module):
    """Multi-head attention with optional cross-attention KV source."""

    heads: int
    head_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        ctx = x if context is None else context
        inner = self.heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, name="to_v")(ctx)

        b, n, _ = q.shape
        m = k.shape[1]

        def split(t, length):
            return (
                t.reshape(b, length, self.heads, self.head_dim)
                .transpose(0, 2, 1, 3)
                .reshape(b * self.heads, length, self.head_dim)
            )

        out = dense_attention(
            split(q, n), split(k, m), split(v, m), 1.0 / math.sqrt(self.head_dim)
        ) if m <= 4096 else spatial_attention(q, k, v, self.heads)
        if out.shape[0] == b * self.heads:
            out = out.reshape(b, self.heads, n, self.head_dim).transpose(0, 2, 1, 3)
            out = out.reshape(b, n, inner)
        return nn.Dense(self.out_dim, name="to_out")(out)


class GEGLU(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.dim_out * 2, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = GEGLU(self.dim * self.mult, name="net_0")(x)
        return nn.Dense(self.dim, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    context_dim: int = 768

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        head_dim = self.dim // self.heads
        h = nn.LayerNorm(name="norm1")(x)
        x = x + Attention(self.heads, head_dim, self.dim, name="attn1")(h)
        h = nn.LayerNorm(name="norm2")(x)
        x = x + Attention(self.heads, head_dim, self.dim, name="attn2")(h, context)
        h = nn.LayerNorm(name="norm3")(x)
        return x + FeedForward(self.dim, name="ff")(h)


class Transformer2D(nn.Module):
    """Spatial transformer: GN + 1x1 proj in/out around transformer blocks."""

    heads: int
    depth: int = 1
    context_dim: int = 768

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        y = nn.GroupNorm(num_groups=gn_groups(c), epsilon=1e-6, name="norm")(x)
        y = nn.Conv(c, (1, 1), name="proj_in")(y)
        y = y.reshape(b, h * w, c)
        for i in range(self.depth):
            y = BasicTransformerBlock(
                c, self.heads, self.context_dim, name=f"transformer_blocks_{i}"
            )(y, context)
        y = y.reshape(b, h, w, c)
        y = nn.Conv(c, (1, 1), name="proj_out")(y)
        return y + residual


class Downsample2D(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), name="conv"
        )(x)


class Upsample2D(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from mrisr_tpu.models.layers import nearest_up2

        return nn.Conv(self.channels, (3, 3), padding="SAME", name="conv")(nearest_up2(x))


class VAEAttention(nn.Module):
    """Single-head VAE mid-block attention (diffusers AttnBlock)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=gn_groups(c), epsilon=1e-6, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, name="to_q")(y)
        k = nn.Dense(c, name="to_k")(y)
        v = nn.Dense(c, name="to_v")(y)
        out = dense_attention(q, k, v, 1.0 / math.sqrt(c))
        out = nn.Dense(c, name="to_out")(out)
        return x + out.reshape(b, h, w, c)
