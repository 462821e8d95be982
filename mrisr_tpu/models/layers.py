"""Shared Flax building blocks for all model families.

Everything is NHWC (`[B, H, W, C]`) — the native TPU conv layout.  The
reference's torch modules are NCHW; conversion happens only at test
boundaries.  Blocks cover the SR3/ResDiff vocabulary (SURVEY.md §2 "ResDiff
UNet" row): Swish-activated GroupNorm conv blocks with noise-level affine
injection, squeeze-excite with residual, positional/noise-level encodings,
spatial self-attention, and HF-guided cross-attention.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn

from mrisr_tpu.ops.attention import spatial_attention, cross_attention_2d


class SinusoidalTimeEmbedding(nn.Module):
    """Integer-timestep embedding (MNIST notebook cell 6 convention).

    ``emb = t * exp(-log(10000) * arange(half) / (half - 1))`` -> sin|cos.
    """

    dim: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half = self.dim // 2
        freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half) / (half - 1))
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class NoiseLevelEncoding(nn.Module):
    """SR3 continuous noise-level encoding.

    ``enc = gamma * exp(-log(1e4) * arange(count) / count)`` -> sin|cos,
    where count = dim // 2; fed by the continuous sqrt-alpha-cumprod
    (see diffusion/sr3.py).
    """

    dim: int

    @nn.compact
    def __call__(self, gamma: jnp.ndarray) -> jnp.ndarray:
        count = self.dim // 2
        step = jnp.arange(count, dtype=jnp.float32) / count
        freqs = jnp.exp(-math.log(1e4) * step)
        args = gamma.reshape(-1, 1).astype(jnp.float32) * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class NoiseLevelMLP(nn.Module):
    """PositionalEncoding -> Dense(4d) -> swish -> Dense(d) (SR3 head)."""

    dim: int

    @nn.compact
    def __call__(self, gamma: jnp.ndarray) -> jnp.ndarray:
        h = NoiseLevelEncoding(self.dim)(gamma)
        h = nn.Dense(self.dim * 4)(h)
        h = nn.swish(h)
        return nn.Dense(self.dim)(h)


class SEBlock(nn.Module):
    """Squeeze-excite with residual: ``x * sigmoid(fc(relu(fc(gap(x))))) + x``.

    Matches the grayscale-fixed ``ResSE`` (``ResDif_execution.ipynb`` cell 8):
    bottleneck ``max(1, C // reduction)``, bias-free Dense layers.
    """

    reduction: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))  # [B, C]
        bottleneck = max(1, c // self.reduction)
        y = nn.Dense(bottleneck, use_bias=False)(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False)(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :] + x


class ConvBlock(nn.Module):
    """GroupNorm -> swish -> (dropout) -> 3x3 conv (SR3 'Block').

    Stays on the XLA GN+swish composition: the fused Pallas GN+SiLU kernel
    (ops/groupnorm.py, verified on chip) measured NET NEGATIVE end-to-end
    at 256^2 — the whole-image VMEM block doesn't fit in fp32 and the
    fp32-stats fallback costs ~1 slice/s (PERF.md) — so it is not wired in.
    """

    features: int
    groups: int = 32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.GroupNorm(num_groups=self.groups)(x)
        h = nn.swish(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Conv(self.features, (3, 3), padding="SAME")(h)


class ResnetBlock(nn.Module):
    """SR3 residual block with feature-wise noise-embedding injection."""

    features: int
    groups: int = 32
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, emb: jnp.ndarray | None = None, deterministic: bool = True
    ) -> jnp.ndarray:
        h = ConvBlock(self.features, self.groups)(x)
        if emb is not None:
            h = h + nn.Dense(self.features)(emb)[:, None, None, :]
        h = ConvBlock(self.features, self.groups, self.dropout)(h, deterministic)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1))(x)
        return h + x


class SelfAttention2D(nn.Module):
    """Spatial self-attention over flattened H*W (SR3 mid-block attention)."""

    groups: int = 32
    num_heads: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        n = nn.GroupNorm(num_groups=self.groups)(x)
        qkv = nn.Conv(c * 3, (1, 1), use_bias=False)(n)
        q, k, v = jnp.split(qkv.reshape(b, h * w, 3 * c), 3, axis=-1)
        out = spatial_attention(q, k, v, self.num_heads)
        out = nn.Conv(c, (1, 1))(out.reshape(b, h, w, c))
        return out + x


class ResnetBlockWithAttn(nn.Module):
    features: int
    groups: int = 32
    dropout: float = 0.0
    with_attn: bool = False

    @nn.compact
    def __call__(self, x, emb=None, deterministic: bool = True):
        x = ResnetBlock(self.features, self.groups, self.dropout)(x, emb, deterministic)
        if self.with_attn:
            x = SelfAttention2D(self.groups)(x)
        return x


class Downsample(nn.Module):
    """3x3 stride-2 conv (SR3 convention)."""

    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))(x)


def nearest_up2(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour x2 upsample via broadcast/reshape.

    Bit-identical to ``jax.image.resize(method="nearest")`` at exact 2x
    (tested), but lowers to a reshape/broadcast instead of a gather —
    measurably cheaper inside the sampler scan on TPU.
    """
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class Upsample(nn.Module):
    """Nearest x2 then 3x3 conv (SR3 convention)."""

    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (3, 3), padding="SAME")(nearest_up2(x))


class HFGuidedCrossAttention(nn.Module):
    """Wavelet-guided cross-attention (cell 8 ``HF_guided_CA`` semantics).

    Query: a 1-channel band-pass map lifted to C channels by a 1x1 conv.
    Key/value: 1x1 conv of the GroupNorm'd feature map.  Single-head full
    spatial attention with 1/sqrt(C) scaling, output projection, residual.
    Runs through the shared attention op, which dispatches to the Pallas
    flash kernel on TPU for large H*W (the reference materialises the full
    (HW)^2 einsum — cell 8 — which is exactly what we avoid).
    """

    groups: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, query_map: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        n = nn.GroupNorm(num_groups=self.groups)(x)
        kv = nn.Conv(c * 2, (1, 1), use_bias=False)(n)
        k, v = jnp.split(kv, 2, axis=-1)
        q = nn.Conv(c, (1, 1), use_bias=False)(query_map)
        out = cross_attention_2d(
            q.reshape(b, h * w, c), k.reshape(b, h * w, c), v.reshape(b, h * w, c)
        )
        out = nn.Conv(c, (1, 1))(out.reshape(b, h, w, c))
        return out + x
