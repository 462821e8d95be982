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
import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from mrisr_tpu.ops.attention import spatial_attention, cross_attention_2d
from mrisr_tpu.ops.space_to_depth import (
    concat_s2d,
    depth_to_space,
    s2d_conv,
    s2d_conv_kernel,
    s2d_conv_v2,
    s2d_downsample_conv,
    s2d_to_s2d_downsample_conv,
    space_to_depth,
    tile4,
    tile4_vec,
)

# torch ``nn.GroupNorm`` default (the reference's ResDiff/SR3 modules never
# override it); flax defaults to 1e-6 — the mismatch was surfaced by the
# torch differential test (tests/test_resdiff_torch_parity.py).
GN_EPS = 1e-5
# Fused Pallas GN+SiLU inside the s2d ConvBlocks (one HBM pass; exact —
# ops/groupnorm.py).  Gated off pending the chain-level A/B on chip.
S2D_FUSED_GN = os.environ.get("MRISR_S2D_FUSED_GN", "0") == "1"
# Phase-shifted 2x2 lowering of the 3x3 s2d convs (16/9x nominal FLOPs vs
# 4x — ops/space_to_depth.py::s2d_conv_v2).  Gated for the chain-level A/B.
S2D_CONV_V2 = os.environ.get("MRISR_S2D_CONV_V2", "0") == "1"


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

    ``s2d=True`` (call arg — the same instance serves both layouts) treats
    the input as a space-to-depth tensor whose PLAIN channel count is
    ``C/4``: the global-average pool additionally averages the four (u,v)
    parity copies (the same pixel set the plain pool sees), so params and
    values match the plain path exactly.
    """

    reduction: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, s2d: bool = False) -> jnp.ndarray:
        if s2d:
            b, h, w, c4 = x.shape
            c = c4 // 4
            y = jnp.mean(x.reshape(b, h, w, c, 4), axis=(1, 2, 4))  # [B, C]
        else:
            c = x.shape[-1]
            y = jnp.mean(x, axis=(1, 2))  # [B, C]
        bottleneck = max(1, c // self.reduction)
        y = nn.Dense(bottleneck, use_bias=False)(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False)(y)
        y = nn.sigmoid(y)
        if s2d:
            y = tile4_vec(y)
        return x * y[:, None, None, :] + x


class SpaceConv(nn.Module):
    """Stride-1 SAME conv applied to a SPACE-TO-DEPTH tensor.

    Declares the PLAIN kernel shape ``(ks, ks, Cin, features)`` under the
    same param names as ``nn.Conv`` (so checkpoints and init RNG streams are
    interchangeable with the plain path — instantiate with ``name="Conv_0"``)
    and rearranges it to the s2d form at apply time (ops/space_to_depth.py).
    """

    features: int
    kernel_size: int = 3
    use_bias: bool = True
    int8: bool = False

    @nn.compact
    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
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
        if self.int8:
            # Serving profile: same params, dynamic int8 execution on the
            # s2d-rearranged kernel (per-out-channel scales computed on the
            # rearranged [kh, kw, 4Cin, 4Cout] kernel directly, so no layout
            # knowledge is needed — ops/quant.py).
            from mrisr_tpu.ops.quant import int8_conv

            w2 = s2d_conv_kernel(kernel)
            b2 = tile4_vec(bias) if bias is not None else None
            return int8_conv(y, w2, b2)
        if self.kernel_size == 3 and S2D_CONV_V2:
            # Phase-shifted 2x2 lowering: 16/9x nominal FLOPs vs 4x for the
            # standard 3x3 s2d kernel (ops/space_to_depth.py::s2d_conv_v2).
            return s2d_conv_v2(y, kernel.astype(y.dtype), bias)
        return s2d_conv(y, kernel.astype(y.dtype), bias)


class SGroupNorm(nn.Module):
    """GroupNorm over the PLAIN channels of an s2d tensor.

    Matches ``flax.linen.GroupNorm`` numerics (fp32 stats, fast variance
    clipped at zero; eps matches torch's 1e-5 default — GN_EPS) with ``(C,)``-shaped scale/bias params, where
    C is the plain channel count (input is ``[B, h, w, 4C]``, c-major).
    Group g's statistics pool channel set {c*4 + k : k in 0..3, c in group
    g} — exactly the pixels/channels the plain GroupNorm pools.
    """

    num_groups: int
    epsilon: float = GN_EPS

    @nn.compact
    def __call__(self, y: jnp.ndarray, fuse_silu: bool = False) -> jnp.ndarray:
        b, h, w, c4 = y.shape
        c = c4 // 4
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones_init(), (c,))
        bias = self.param("bias", nn.initializers.zeros_init(), (c,))

        if fuse_silu:
            # GN + SiLU in one HBM pass.  The c-major s2d channel order makes
            # plain group g a CONTIGUOUS lane range [g*(c//g)*4, (g+1)*(c//g)*4)
            # of the 4C lane dim, so the plain-layout Pallas kernel
            # (ops/groupnorm.py) applies verbatim with groups=g and the
            # scale/bias tiled onto s2d lanes; stats pool the same
            # H*W*(c//g)*4 elements the plain GroupNorm pools.  The op
            # guarantees SiLU is applied (kernel on TPU when the image block
            # fits VMEM, exact lax composition elsewhere).
            from mrisr_tpu.ops.groupnorm import fused_group_norm_silu

            return fused_group_norm_silu(
                y, tile4_vec(scale), tile4_vec(bias), g, self.epsilon
            )

        xf = y.reshape(b, h, w, g, c // g, 4).astype(jnp.float32)
        mu = jnp.mean(xf, axis=(1, 2, 4, 5), keepdims=True)
        mu2 = jnp.mean(xf * xf, axis=(1, 2, 4, 5), keepdims=True)
        var = jnp.maximum(0.0, mu2 - mu * mu)
        norm = (xf - mu) * jax.lax.rsqrt(var + self.epsilon)
        norm = norm.reshape(b, h, w, c4)
        sc = tile4_vec(scale.astype(jnp.float32))
        bi = tile4_vec(bias.astype(jnp.float32))
        return (norm * sc + bi).astype(y.dtype)


class PlainConvInt8(nn.Module):
    """Stride-1 SAME conv executed in dynamic int8 (ops/quant.py).

    Param-compatible with ``nn.Conv`` (same ``kernel``/``bias`` names and
    shapes, same lecun-normal init stream), so checkpoints are shared with
    the exact path — instantiate with the plain conv's ``name``.
    """

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        from mrisr_tpu.ops.quant import int8_conv

        return int8_conv(x, kernel, bias)


class ConvBlock(nn.Module):
    """GroupNorm -> swish -> (dropout) -> 3x3 conv (SR3 'Block').

    Stays on the XLA GN+swish composition: the fused Pallas GN+SiLU kernel
    (ops/groupnorm.py, verified on chip) measured NET NEGATIVE end-to-end
    at 256^2 — the whole-image VMEM block doesn't fit in fp32 and the
    fp32-stats fallback costs ~1 slice/s (PERF.md) — so it is not wired in.

    ``s2d=True`` runs the whole block on space-to-depth tensors (the
    low-channel 256^2 stage is layout-bound otherwise — PERF.md round 3);
    params are identical to the plain path.
    """

    features: int
    groups: int = 32
    dropout: float = 0.0
    s2d: bool = False
    # Serving profile: run the 3x3 conv in dynamic int8 on the MXU (2x bf16
    # peak on v5e) — same param tree, quantization at apply time
    # (ops/quant.py).  Fidelity goes through the parity harness like every
    # other serving profile (ca_kv_pool).
    int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.s2d:
            # At the s2d shape the image block fits VMEM (128^2 x 4C fp32 =
            # 8 MB at C=32) and the lanes are fully packed, so the fused
            # Pallas GN+SiLU (one HBM pass instead of stats + normalize
            # passes) is viable here — unlike the plain 256^2 C=32 case
            # recorded above.  Env-gated for chain-level A/B (PERF.md).
            h = SGroupNorm(self.groups, name="GroupNorm_0")(x, fuse_silu=S2D_FUSED_GN)
            if not S2D_FUSED_GN:
                h = nn.swish(h)
        else:
            h = nn.GroupNorm(num_groups=self.groups, epsilon=GN_EPS, name="GroupNorm_0")(x)
            h = nn.swish(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        if self.s2d:
            return SpaceConv(self.features, 3, name="Conv_0", int8=self.int8)(h)
        if self.int8:
            return PlainConvInt8(self.features, 3, name="Conv_0")(h)
        return nn.Conv(self.features, (3, 3), padding="SAME", name="Conv_0")(h)


class ResnetBlock(nn.Module):
    """SR3 residual block with feature-wise noise-embedding injection."""

    features: int
    groups: int = 32
    dropout: float = 0.0
    s2d: bool = False
    int8: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, emb: jnp.ndarray | None = None, deterministic: bool = True
    ) -> jnp.ndarray:
        h = ConvBlock(self.features, self.groups, s2d=self.s2d, int8=self.int8)(x)
        if emb is not None:
            d = nn.Dense(self.features)(emb)
            if self.s2d:
                d = tile4_vec(d)
            h = h + d[:, None, None, :]
        h = ConvBlock(
            self.features, self.groups, self.dropout, s2d=self.s2d, int8=self.int8
        )(h, deterministic)
        in_ch = x.shape[-1] // 4 if self.s2d else x.shape[-1]
        if in_ch != self.features:
            if self.s2d:
                x = SpaceConv(self.features, 1, name="Conv_0")(x)
            else:
                x = nn.Conv(self.features, (1, 1), name="Conv_0")(x)
        return h + x


class SelfAttention2D(nn.Module):
    """Spatial self-attention over flattened H*W (SR3 mid-block attention)."""

    groups: int = 32
    num_heads: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        n = nn.GroupNorm(num_groups=self.groups, epsilon=GN_EPS)(x)
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
    s2d: bool = False
    int8: bool = False

    @nn.compact
    def __call__(self, x, emb=None, deterministic: bool = True):
        assert not (self.s2d and self.with_attn), "attention blocks never run in s2d space"
        x = ResnetBlock(
            self.features, self.groups, self.dropout, s2d=self.s2d, int8=self.int8
        )(x, emb, deterministic)
        if self.with_attn:
            x = SelfAttention2D(self.groups)(x)
        return x


class Downsample(nn.Module):
    """3x3 stride-2 conv (SR3 convention).

    ``s2d_exit=True`` consumes a space-to-depth tensor and emits the
    normal-space half-resolution map (the downsample is where the s2d stage
    naturally rejoins the rest of the UNet).
    """

    features: int
    s2d_exit: bool = False
    s2d_io: bool = False  # s2d input AND s2d output (deeper s2d stages)

    @nn.compact
    def __call__(self, x):
        if self.s2d_io:
            return _S2DToS2DConv(self.features, name="Conv_0")(x)
        if self.s2d_exit:
            return _S2DExitConv(self.features, name="Conv_0")(x)
        return nn.Conv(
            self.features, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            name="Conv_0",
        )(x)


class _S2DExitConv(nn.Module):
    """Stride-2 pad-1 3x3 conv on an s2d tensor -> normal-space output.

    Param-compatible with the plain ``nn.Conv`` inside :class:`Downsample`.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1] // 4
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return s2d_downsample_conv(x, kernel.astype(x.dtype), bias)


class _S2DToS2DConv(nn.Module):
    """Stride-2 pad-1 3x3 conv on an s2d tensor -> s2d half-resolution output.

    Param-compatible with the plain ``nn.Conv`` inside :class:`Downsample`.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1] // 4
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return s2d_to_s2d_downsample_conv(x, kernel.astype(x.dtype), bias)


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
    """Nearest x2 then 3x3 conv (SR3 convention).

    ``s2d_entry=True`` takes a normal-space input and returns the upsampled
    map in SPACE-TO-DEPTH form: ``s2d(nearest_up2(x))`` is a free channel
    tile (every (u,v) sub-position equals the source pixel), so entering the
    s2d stage at the upsample costs no transform pass.
    """

    features: int
    s2d_entry: bool = False
    s2d_io: bool = False  # s2d input AND s2d output (deeper s2d stages)

    @nn.compact
    def __call__(self, x):
        if self.s2d_io:
            # nearest-up2 of an s2d tensor in the FINER grid's s2d form:
            # every output block's four sub-positions copy the source pixel,
            # so it is tile4 of the depth_to_space — one d2s pass, then the
            # conv runs lane-packed.
            return SpaceConv(self.features, 3, name="Conv_0")(
                tile4(depth_to_space(x))
            )
        if self.s2d_entry:
            return SpaceConv(self.features, 3, name="Conv_0")(tile4(x))
        return nn.Conv(self.features, (3, 3), padding="SAME", name="Conv_0")(
            nearest_up2(x)
        )


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
    def __call__(
        self,
        x: jnp.ndarray,
        query_map: jnp.ndarray,
        s2d: bool = False,
        io_s2d: bool = False,
        kv_pool: int = 0,
    ) -> jnp.ndarray:
        """``s2d=True``: plain-space I/O, projections computed on the s2d
        form.  ``io_s2d=True``: ``x`` and the return value ARE s2d tensors
        (``query_map`` stays plain full-res) — used when the surrounding
        stage already runs in s2d space.  ``kv_pool >= 2`` (fast serving
        profile): K/V come from the ``kv_pool x kv_pool`` average-pooled
        normalized map — ``kv_pool^2`` fewer score columns/exps at the
        quadratic-cost sites; exact semantics when 0/1."""
        if kv_pool and kv_pool > 1:
            s2d = False  # pooled K/V always uses the plain compute path
        if io_s2d:
            if s2d:
                return self._call_s2d(x, query_map, io=True)
            # The s2d compute path measured net-negative (the s2d->token
            # relayout feeding the attention kernel); with an s2d stage
            # around us, hop to plain space for the CA and hop back.
            return space_to_depth(
                self._call_plain(depth_to_space(x), query_map, kv_pool)
            )
        b, h, w, c = x.shape
        if s2d and h % 2 == 0 and w % 2 == 0:
            return self._call_s2d(x, query_map, io=False)
        return self._call_plain(x, query_map, kv_pool)

    def _call_plain(
        self, x: jnp.ndarray, query_map: jnp.ndarray, kv_pool: int = 0
    ) -> jnp.ndarray:
        b, h, w, c = x.shape
        n = nn.GroupNorm(num_groups=self.groups, epsilon=GN_EPS, name="GroupNorm_0")(x)
        p = int(kv_pool) if kv_pool else 0
        if p > 1 and h % p == 0 and w % p == 0:
            # Fast profile: keys/values from the p x p average-pooled
            # normalized map.  Pooling commutes exactly with the 1x1 kv
            # projection, so this IS "attend to pooled keys/values" while
            # also running the projection p^2 cheaper.  Same param tree.
            n_kv = nn.avg_pool(n, (p, p), strides=(p, p))
            hk, wk = h // p, w // p
        else:
            n_kv, hk, wk = n, h, w
        kv = nn.Conv(c * 2, (1, 1), use_bias=False, name="Conv_0")(n_kv)
        k, v = jnp.split(kv, 2, axis=-1)
        q = nn.Conv(c, (1, 1), use_bias=False, name="Conv_1")(query_map)
        out = cross_attention_2d(
            q.reshape(b, h * w, c), k.reshape(b, hk * wk, c), v.reshape(b, hk * wk, c)
        )
        out = nn.Conv(c, (1, 1), name="Conv_2")(out.reshape(b, h, w, c))
        return out + x

    def _call_s2d(
        self, x: jnp.ndarray, query_map: jnp.ndarray, io: bool = False
    ) -> jnp.ndarray:
        """Space-to-depth execution of the GN + 1x1 projections (exact).

        At the hot 128^2 site C=32, so every projection/normalisation runs
        4x lane-under-packed in plain NHWC (PERF.md round 3); computing them
        on the s2d form packs the lanes.  The attention itself is token-
        permutation-equivariant, so feeding tokens in (pixel-block, subpixel)
        order — a pure reshape of the s2d tensor — gives bit-identical
        semantics to raster order.  Same param tree/names as the plain path.

        ``io=True``: ``x`` already IS the s2d tensor and the s2d result is
        returned without transforms (the surrounding stage runs in s2d).
        """
        if io:
            xs = x
            b, h2, w2, c4 = xs.shape
            c = c4 // 4
        else:
            b, h, w, c = x.shape
            h2, w2 = h // 2, w // 2
            xs = space_to_depth(x)  # [B, h2, w2, 4c]
        n = SGroupNorm(self.groups, name="GroupNorm_0")(xs)
        kv = SpaceConv(c * 2, 1, use_bias=False, name="Conv_0")(n)  # [B,h2,w2,8c]
        k, v = jnp.split(kv.reshape(b, h2, w2, 2 * c, 4), 2, axis=-2)
        qm = space_to_depth(query_map)  # [B, h2, w2, 4]
        q = SpaceConv(c, 1, use_bias=False, name="Conv_1")(qm)  # [B,h2,w2,4c]

        def tok(t):  # (pixel-block, c, sp) -> tokens [B, n, c]
            return t.transpose(0, 1, 2, 4, 3).reshape(b, h2 * w2 * 4, c)

        out = cross_attention_2d(tok(q.reshape(b, h2, w2, c, 4)), tok(k), tok(v))
        # tokens back to the c-major s2d form
        out = out.reshape(b, h2, w2, 4, c).transpose(0, 1, 2, 4, 3)
        out = out.reshape(b, h2, w2, 4 * c)
        out = SpaceConv(c, 1, name="Conv_2")(out)
        if io:
            return out + xs
        return depth_to_space(out) + x
