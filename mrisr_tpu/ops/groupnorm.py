"""Pallas fused GroupNorm + SiLU for NHWC feature maps.

The SR3 ConvBlock (models/layers.py) is GN -> SiLU -> conv; XLA executes
the normalization as separate stats + normalize passes over HBM.  This
kernel computes group statistics, the affine normalization, and the SiLU
activation in ONE pass through VMEM per image (grid over batch), saving a
full read of the activation tensor at 256² where the conv path is
bandwidth-bound (PERF.md "Conv path").

Backward uses the exact lax composition via custom_vjp (identical math, so
gradients are exact); the kernel is forward/inference-path only.

Layout note: channels stay minor (C on lanes).  Group stats reduce over
(H, W, C/G); with C=32 and 16 groups the per-group slices are 2 lanes wide
— the reduction is still a single VMEM pass.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# opt-out switch (MRISR_FUSED_GN=0 falls back to the lax composition)
FUSED_GN = os.environ.get("MRISR_FUSED_GN", "1") == "1"


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups, eps):
    x = x_ref[0].astype(jnp.float32)  # [H, W, C]
    h, w, c = x.shape
    gsz = c // groups

    # Group statistics without a lane-splitting reshape (Mosaic cannot
    # lower [H,W,C] -> [HW,G,C/G]): per-channel sums stay on lanes, then a
    # [C,C] same-group averaging matmul spreads each group's mean/2nd
    # moment back onto its member channels.
    s1 = jnp.sum(x, axis=(0, 1)).reshape(1, c)
    s2 = jnp.sum(x * x, axis=(0, 1)).reshape(1, c)
    ci = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0) // gsz
    cj = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1) // gsz
    avg = (ci == cj).astype(jnp.float32) / float(h * w * gsz)
    mean = jax.lax.dot(s1, avg, preferred_element_type=jnp.float32)  # [1, C]
    ex2 = jax.lax.dot(s2, avg, preferred_element_type=jnp.float32)
    # fast variance clipped at zero — matches flax.linen.GroupNorm /
    # models.layers.SGroupNorm numerics exactly
    var = jnp.maximum(ex2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)

    y = (x - mean[0][None, None, :]) * inv[0][None, None, :]
    y = y * scale_ref[0, :][None, None, :] + bias_ref[0, :][None, None, :]
    o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def _gn_silu_forward(x, scale, bias, groups, eps, interpret=False):
    b, h, w, c = x.shape
    return pl.pallas_call(
        functools.partial(_gn_silu_kernel, groups=groups, eps=eps),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x, scale.reshape(1, c), bias.reshape(1, c))


def group_norm_silu_reference(x, scale, bias, groups, eps=1e-5):
    """Exact lax composition (also the backward path)."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=(1, 3), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    y = y * scale[None, None, None, :] + bias[None, None, None, :]
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_group_norm_silu(x, scale, bias, groups: int, eps: float = 1e-5):
    """One-pass GN+SiLU on TPU; falls back to the lax composition elsewhere."""
    if _use_kernel(x, groups):
        return _gn_silu_forward(x, scale, bias, groups, eps)
    return group_norm_silu_reference(x, scale, bias, groups, eps)


def _use_kernel(x, groups) -> bool:
    try:
        b, h, w, c = x.shape
        vmem_ok = h * w * c * 4 <= 12 * 1024 * 1024  # fp32 image block in VMEM
        return (
            FUSED_GN
            and jax.default_backend() == "tpu"
            and c % groups == 0
            and c % 8 == 0
            and vmem_ok
        )
    except Exception:
        return False


def _fwd(x, scale, bias, groups, eps):
    return fused_group_norm_silu(x, scale, bias, groups, eps), (x, scale, bias)


def _bwd(groups, eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: group_norm_silu_reference(x_, s_, b_, groups, eps),
        x, scale, bias,
    )
    return vjp(g)


fused_group_norm_silu.defvjp(_fwd, _bwd)
