"""Space-to-depth (pixel-unshuffle) execution of low-channel conv stages.

Motivation (PERF.md round 3, tools/perf_layout*.py measurements on v5e):
the ResDiff UNet's 256^2 stage runs at C=32, where XLA's NHWC lane layout
leaves the MXU/VPU 4x under-packed — a 3x3 conv measures 10.9 TFLOP/s and
even a 1x1 conv costs the same wall time.  The SAME convolution expressed on
the space-to-depth transform of the tensor — (B, H, W, C) viewed as
(B, H/2, W/2, 4C) — runs at 140-190 TFLOP/s because the channel dimension
fills the 128-wide lanes.  The rewrite is exact: a stride-1 3x3 conv on the
original grid equals a 3x3 conv on the s2d grid with a sparse rearrangement
of the kernel (4x the nominal FLOPs, ~14x the execution rate).

Channel order convention: s2d index ``c * 4 + (u*2 + v)`` where ``u``/``v``
are the row/col parities ("c-major, (u,v)-minor").  All helpers here agree
on it.  This order makes channel-concat of s2d tensors a PLAIN concatenate
(round 4: the previous (u,v)-major order forced reshape-concat-reshape
relayouts that measured ~1.9 ms/step in the 50-step sampler chain).

This replaces what the reference gets from cuDNN's implicit layout handling
(the reference runs the same UNet through torch CUDA kernels — SURVEY.md §2
"ResDiff UNet" row); on TPU the layout transformation has to be explicit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """``[B, H, W, C] -> [B, H/2, W/2, 4C]``, c-major channel order."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, f"s2d needs even spatial dims, got {h}x{w}"
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 5, 2, 4).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(y: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    b, h, w, c4 = y.shape
    c = c4 // 4
    y = y.reshape(b, h, w, c, 2, 2)
    return y.transpose(0, 1, 4, 2, 5, 3).reshape(b, 2 * h, 2 * w, c)


def concat_s2d(*tensors: jnp.ndarray) -> jnp.ndarray:
    """Channel-concat of s2d tensors that PRESERVES standard order.

    With the c-major channel order this IS a plain concatenate —
    ``concat_s2d(s2d(x), s2d(y)) == s2d(concat([x, y], axis=-1))`` holds
    with zero relayout (the round-4 win; the old (u,v)-major order needed
    reshape-concat-reshape, ~1.9 ms/step in the sampler chain).
    """
    return jnp.concatenate(tensors, axis=-1)


def tile4(z: jnp.ndarray) -> jnp.ndarray:
    """s2d of the nearest-x2 upsample: ``s2d(nearest_up2(z)) == tile4(z)``.

    Every (u, v) sub-position of the upsampled image is a copy of ``z``; in
    c-major order that is a per-channel x4 repeat (broadcast + reshape).
    """
    b, h, w, c = z.shape
    z4 = jnp.broadcast_to(z[..., None], (b, h, w, c, 4))
    return z4.reshape(b, h, w, 4 * c)


def tile4_vec(v: jnp.ndarray) -> jnp.ndarray:
    """Per-channel vector (bias / scale / embedding row) lifted to s2d order."""
    v4 = jnp.broadcast_to(v[..., None], v.shape + (4,))
    return v4.reshape(v.shape[:-1] + (4 * v.shape[-1],))


def s2d_conv_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Rearrange a stride-1 SAME conv kernel to act on s2d tensors.

    ``conv(x, w, SAME) == d2s(conv(s2d(x), s2d_conv_kernel(w), SAME))`` for
    odd kernel sizes.  Derivation: output pixel ``y[2i+r, 2j+s]`` reads input
    ``x[2i+r+a, 2j+s+b]``; writing ``2i+r+a = 2(i+A)+u`` gives
    ``A = (r+a)//2, u = (r+a)%2``, so each original tap lands at a unique
    (A, u) per output parity r — the s2d kernel is (ks x ks x 4Cin x 4Cout)
    with 25% structural density (each weight appears once per output parity).
    """
    ks, ks2_, cin, cout = w.shape
    assert ks == ks2_ and ks % 2 == 1, f"odd square kernels only, got {w.shape}"
    k2 = ks // 2
    offs = []
    for r in (0, 1):
        for a in range(ks):
            offs.append((r + a - k2) // 2)
    amin, amax = min(offs), max(offs)
    ks2 = amax - amin + 1

    w2 = jnp.zeros((ks2, ks2, 4 * cin, 4 * cout), w.dtype)
    for a in range(ks):
        for b_ in range(ks):
            for r in (0, 1):
                for s in (0, 1):
                    A = (r + a - k2) // 2
                    u = (r + a - k2) % 2
                    B = (s + b_ - k2) // 2
                    v = (s + b_ - k2) % 2
                    sp_in = u * 2 + v
                    sp_out = r * 2 + s
                    w2 = w2.at[
                        A - amin, B - amin, sp_in::4, sp_out::4
                    ].set(w[a, b_])
    return w2


def s2d_phase_shift(y: jnp.ndarray) -> jnp.ndarray:
    """Phase-(1,1)-shifted s2d view: ``z[i, j, (c,u,v)] = x[2i-1+u, 2j-1+v]``.

    ``y`` is the standard s2d form of ``x`` (c-major); the result has one
    extra block row/col (``[B, h2+1, w2+1, 4C]``, zero padded at the plain
    borders) whose 2x2 blocks sit on the HALF-ODD grid.  Why this exists:
    a plain stride-1 3x3 conv's receptive field for the output block at
    ``(i, j)`` is the 4x4 plain window starting at ``(2i-1, 2j-1)`` — NOT
    aligned to the standard s2d blocks (it straddles 3x3 of them, which is
    what gives :func:`s2d_conv_kernel` its 25%-dense / 4x-FLOP lowering),
    but EXACTLY the 2x2 window of phase-shifted blocks at ``(i, j)``.  A
    2x2 VALID conv over this view therefore computes the same output with a
    56%-dense kernel — 16/9 x nominal FLOPs instead of 4x
    (:func:`s2d_conv_v2`).  Each plain pixel appears exactly once across
    the four shifted sub-position channels, so the view is one
    pad/slice/restack pass over the tensor.
    """
    b, h2, w2, c4 = y.shape
    c = c4 // 4
    yr = jnp.pad(
        y.reshape(b, h2, w2, c, 2, 2),
        ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0), (0, 0)),
    )
    # z sub-position (u', v') pulls from source sub-position (1-u', 1-v')
    # at the block shifted up/left when u'/v' is 0.
    z = jnp.stack(
        [
            yr[:, 0 : h2 + 1, 0 : w2 + 1, :, 1, 1],
            yr[:, 0 : h2 + 1, 1 : w2 + 2, :, 1, 0],
            yr[:, 1 : h2 + 2, 0 : w2 + 1, :, 0, 1],
            yr[:, 1 : h2 + 2, 1 : w2 + 2, :, 0, 0],
        ],
        axis=-1,
    )  # [B, h2+1, w2+1, C, 4] — c-major like the standard form
    return z.reshape(b, h2 + 1, w2 + 1, 4 * c)


def s2d_conv_v2_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Rearrange a stride-1 SAME 3x3 kernel for the phase-shifted s2d view.

    ``conv(x, w, SAME) == d2s(s2d_conv_v2(s2d(x), w))``.  Output sub-position
    ``r`` tap ``a`` reads plain row ``2i + r + a - 1 = 2(i + di) - 1 + u``
    with ``di = (r+a)//2``, ``u = (r+a)%2`` — a unique (di, u) slot per
    (r, a), so the 2x2 kernel over phase-shifted blocks is 56% dense
    (9 taps x 4 output sub-positions into 2*2*4*4 = 64 slots): 16/9 x the
    plain conv's FLOPs at full 128-lane packing, vs 4x for the standard
    3x3 s2d lowering (PERF.md round 7).
    """
    ks, ks2_, cin, cout = w.shape
    assert ks == 3 and ks2_ == 3, f"v2 lowering is for 3x3 kernels, got {w.shape}"
    w2 = jnp.zeros((2, 2, 4 * cin, 4 * cout), w.dtype)
    for a in range(3):
        for b_ in range(3):
            for r in (0, 1):
                for s in (0, 1):
                    di, u = (r + a) // 2, (r + a) % 2
                    dj, v = (s + b_) // 2, (s + b_) % 2
                    w2 = w2.at[di, dj, (u * 2 + v) :: 4, (r * 2 + s) :: 4].set(
                        w[a, b_]
                    )
    return w2


def s2d_conv_v2(
    y: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Stride-1 SAME 3x3 conv on an s2d tensor via the phase-shifted view.

    Mathematically identical to :func:`s2d_conv` (same plain kernel ``w``,
    same s2d-form output) at 16/9 x nominal FLOPs instead of 4x.
    """
    z = s2d_phase_shift(y)
    w2 = s2d_conv_v2_kernel(w).astype(y.dtype)
    out = jax.lax.conv_general_dilated(
        z, w2, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    if bias is not None:
        out = out + tile4_vec(bias).astype(y.dtype)
    return out


def s2d_downsample_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Rearrange the SR3 stride-2 pad-1 3x3 downsample kernel for s2d input.

    The downsample EXITS s2d space: output is a normal-space ``[B, H/2, W/2,
    Cout]`` map.  ``o[i,j] = sum_{a,b in 0..2} x[2i+a-1, 2j+b-1] W[a,b]``
    becomes a 2x2 stride-1 conv over s2d blocks with padding ((1,0),(1,0)).
    """
    ks, ks2_, cin, cout = w.shape
    assert ks == 3 and ks2_ == 3, f"downsample kernel must be 3x3, got {w.shape}"
    w2 = jnp.zeros((2, 2, 4 * cin, cout), w.dtype)
    for a in range(3):
        for b_ in range(3):
            A = (a - 1) // 2  # in {-1, 0}
            u = (a - 1) % 2
            B = (b_ - 1) // 2
            v = (b_ - 1) % 2
            w2 = w2.at[A + 1, B + 1, (u * 2 + v)::4, :].set(w[a, b_])
    return w2


def s2d_conv(y: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Apply a plain stride-1 SAME conv kernel ``w`` to an s2d tensor."""
    w2 = s2d_conv_kernel(w).astype(y.dtype)
    out = jax.lax.conv_general_dilated(
        y, w2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    if bias is not None:
        out = out + tile4_vec(bias).astype(y.dtype)
    return out


def s2d_downsample_conv(
    y: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Stride-2 pad-1 3x3 conv on an s2d tensor; returns NORMAL-space output."""
    w2 = s2d_downsample_kernel(w).astype(y.dtype)
    out = jax.lax.conv_general_dilated(
        y, w2, (1, 1), ((1, 0), (1, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    if bias is not None:
        out = out + bias.astype(y.dtype)
    return out


def s2d_to_s2d_downsample_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 pad-1 3x3 downsample kernel for s2d input AND s2d output.

    Output block ``(m, n)`` parity ``(r, s)`` is output pixel ``(2m+r,
    2n+s)``, which reads input pixels ``4m + 2r + a - 1`` — input blocks
    ``2m-1 .. 2m+1``: a stride-2 pad-1 3x3 conv over the input BLOCK grid
    with kernel ``W2[1 + (2r+a-1)//2, 1 + (2s+b-1)//2, (u,v)ci, (r,s)co] =
    W[a, b, ci, co]`` where ``u = (2r+a-1) % 2`` (each tap lands in a unique
    slot per output parity — 25% structural density, like s2d_conv_kernel).
    """
    ks, ks2_, cin, cout = w.shape
    assert ks == 3 and ks2_ == 3, f"downsample kernel must be 3x3, got {w.shape}"
    w2 = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for a in range(3):
        for b_ in range(3):
            for r in (0, 1):
                for s in (0, 1):
                    A = 1 + (2 * r + a - 1) // 2
                    u = (2 * r + a - 1) % 2
                    B = 1 + (2 * s + b_ - 1) // 2
                    v = (2 * s + b_ - 1) % 2
                    w2 = w2.at[A, B, (u * 2 + v)::4, (r * 2 + s)::4].set(w[a, b_])
    return w2


def s2d_to_s2d_downsample_conv(
    y: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Stride-2 pad-1 3x3 conv on an s2d tensor; returns the s2d form of the
    half-resolution output (``s2d(conv_stride2(d2s(y), w))``)."""
    w2 = s2d_to_s2d_downsample_kernel(w).astype(y.dtype)
    out = jax.lax.conv_general_dilated(
        y, w2, (2, 2), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    if bias is not None:
        out = out + tile4_vec(bias).astype(y.dtype)
    return out
