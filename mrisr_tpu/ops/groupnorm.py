"""Pallas fused GroupNorm + SiLU for NHWC feature maps.

The SR3 ConvBlock (models/layers.py) is GN -> SiLU -> conv; XLA executes
the normalization as stats + normalize passes over HBM (~3 HBM passes).
This kernel keeps the whole image resident in VMEM in its storage dtype
and streams the fp32 statistics/normalization through row chunks, so HBM
sees ONE read and ONE write — the bandwidth floor for an exact GN.

VMEM economics (the reason for the chunked design): the naive whole-image
kernel materializes the fp32 cast + normalized temporaries, peaking at
~4 full-image fp32 buffers — measured 32 MB at the s2d level-0 shape
(1, 128, 128, 128) fp32 against the 16 MB scoped-VMEM limit (hard compile
error on v5e).  A second failure mode (also measured as a hard v5e compile
error, 16.01 MB vs the 16.00 MB limit): with full-image blocks on BOTH
operands the Pallas pipeline double-buffers each, costing
2 x (in + out) = 16 MB at the bf16 serving shape before any temporary.
The committed design therefore grids over ``(batch, row-chunk)``: the
input keeps a full-image block whose index only changes with the batch
coordinate (the pipeline fetches it ONCE per image and skips the copy on
revisited blocks), the output uses row-chunk blocks, and the group
statistics are computed at chunk 0 into a persistent VMEM scratch that
the remaining chunks read.  Peak = 2 x image (in) + 2 x chunk (out)
+ O(chunk) fp32 temporaries ~= 12.4 MB at (8, 128, 128, 128) bf16; HBM
still sees ONE read and ONE write.  The ``_use_kernel`` gate mirrors that
budget, so fp32 inputs at big shapes fall back to the exact lax
composition automatically (e.g. module init, which runs in fp32).

Backward uses the exact lax composition via custom_vjp (identical math, so
gradients are exact); the kernel is forward/inference-path only.

Layout note: channels stay minor (C on lanes).  Group stats reduce over
(H, W, C/G); per-channel sums stay on lanes, and a [C, C] same-group
averaging matmul spreads each group's mean/2nd moment back onto its member
channels (Mosaic cannot lower a lane-splitting [H,W,C] -> [HW,G,C/G]
reshape).  With the c-major space-to-depth channel order a plain group is
a contiguous lane range, so s2d tensors use this kernel verbatim
(models/layers.py::SGroupNorm ``fuse_silu``).
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

# Rows per fp32 working chunk inside the kernel (the image stays resident
# in its storage dtype; only the chunk is cast/normalized in fp32).
_CHUNK_ROWS = 16


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, sb_ref, *, groups, eps):
    # Grid = (batch, row-chunk).  x_ref holds the FULL image of the current
    # batch element (its block index ignores j, so the pipeline fetches it
    # once per image); o_ref is the j-th row chunk; sb_ref is persistent
    # VMEM scratch carrying the folded scale/bias from chunk 0 to the rest.
    j = pl.program_id(1)
    h, w, c = x_ref.shape[1:]
    gsz = c // groups
    bh = o_ref.shape[1]
    n_chunks = h // bh  # h % bh == 0 enforced by _use_kernel

    def _chunk(i):
        return x_ref[0, pl.ds(i * bh, bh)].astype(jnp.float32)  # [bh, W, C]

    @pl.when(j == 0)
    def _compute_stats():
        def _stats_body(i, carry):
            s1, s2 = carry
            xc = _chunk(i)
            return s1 + jnp.sum(xc, axis=(0, 1)), s2 + jnp.sum(xc * xc, axis=(0, 1))

        zero = jnp.zeros((c,), jnp.float32)
        s1, s2 = jax.lax.fori_loop(0, n_chunks, _stats_body, (zero, zero))

        # Spread per-group stats back onto member channels with a same-group
        # averaging matmul (groups are contiguous lane ranges).
        ci = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0) // gsz
        cj = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1) // gsz
        avg = (ci == cj).astype(jnp.float32) / float(h * w * gsz)
        mean = jax.lax.dot(s1.reshape(1, c), avg, preferred_element_type=jnp.float32)
        ex2 = jax.lax.dot(s2.reshape(1, c), avg, preferred_element_type=jnp.float32)
        # fast variance clipped at zero — matches flax.linen.GroupNorm /
        # models.layers.SGroupNorm numerics exactly
        var = jnp.maximum(ex2 - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + eps)
        sb_ref[0, :] = inv[0] * scale_ref[0, :]
        sb_ref[1, :] = bias_ref[0, :] - mean[0] * inv[0] * scale_ref[0, :]

    y = _chunk(j) * sb_ref[0, :][None, None, :] + sb_ref[1, :][None, None, :]
    o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def _gn_silu_forward(x, scale, bias, groups, eps, interpret=False):
    b, h, w, c = x.shape
    bh = min(_CHUNK_ROWS, h)
    return pl.pallas_call(
        functools.partial(_gn_silu_kernel, groups=groups, eps=eps),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, h // bh),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, w, c), lambda i, j: (i, j, 0, 0)),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # Sequential on both axes: chunks of one image must follow its
            # chunk-0 stats, and the stats scratch is shared across images.
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        x,
        scale.astype(jnp.float32).reshape(1, c),
        bias.astype(jnp.float32).reshape(1, c),
    )


def group_norm_silu_reference(x, scale, bias, groups, eps=1e-5):
    """Exact lax composition (also the backward path)."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=(1, 3), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    y = y * scale[None, None, None, :].astype(jnp.float32)
    y = y + bias[None, None, None, :].astype(jnp.float32)
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_group_norm_silu(x, scale, bias, groups: int, eps: float = 1e-5):
    """One-HBM-pass GN+SiLU on TPU; exact lax composition elsewhere."""
    if _use_kernel(x, groups):
        return _gn_silu_forward(x, scale, bias, groups, eps)
    return group_norm_silu_reference(x, scale, bias, groups, eps)


def _use_kernel(x, groups) -> bool:
    try:
        b, h, w, c = x.shape
        itemsize = jnp.dtype(x.dtype).itemsize
        bh = min(_CHUNK_ROWS, h)
        # Double-buffered full-image input block + double-buffered row-chunk
        # output block + ~3 fp32 chunk temporaries, against the 16 MB
        # scoped-VMEM limit (with margin).  Mirrors the measured pipeline
        # accounting: full-image blocks cost 2x their size regardless of
        # whether the revisited copy is skipped.
        peak = 2 * h * w * c * itemsize + 2 * bh * w * c * itemsize + 3 * bh * w * c * 4
        return (
            FUSED_GN
            and jax.default_backend() == "tpu"
            and c % groups == 0
            and c % 8 == 0
            and h % bh == 0
            and peak <= 14 * 1024 * 1024
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
