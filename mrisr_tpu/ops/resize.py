"""Image resizing / blurring / pixel-(un)shuffle ops, TPU-first.

The reference stack mixes three resampling conventions that all matter for
numerical parity (SURVEY.md §7 "hard parts"):

* ``torch.nn.functional.interpolate(mode='bicubic', align_corners=False)`` —
  cubic kernel with a = -0.75, **no antialiasing** (loader wrappers at
  ``ResDif_execution.ipynb`` cells 27/40; SimpleCNN's residual upsample).
* ``PIL.Image.resize(..., LANCZOS / BICUBIC)`` — Lanczos-3 / cubic a = -0.5,
  **antialiased on downscale** (FastMRI degradation, cell 22).
* ``scipy.ndimage.gaussian_filter`` (mode='reflect') for the synthetic
  low-field blur.

Rather than approximating with ``jax.image.resize`` (whose cubic is a = -0.5
and whose antialias policy differs), each resize is expressed as two small
dense weight matrices applied with ``einsum`` — separable resampling as
matmuls.  The weights are computed once on the host (numpy), become XLA
constants, and the resampling itself runs on the MXU.  This gives exact
kernel-level control *and* is the fastest formulation on TPU for the
256/512-pixel sizes used here.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Kernel functions
# ---------------------------------------------------------------------------

def _cubic(x: np.ndarray, a: float) -> np.ndarray:
    x = np.abs(x)
    x2 = x * x
    x3 = x2 * x
    out = np.where(
        x <= 1.0,
        (a + 2.0) * x3 - (a + 3.0) * x2 + 1.0,
        np.where(x < 2.0, a * x3 - 5.0 * a * x2 + 8.0 * a * x - 4.0 * a, 0.0),
    )
    return out


def _sinc(x: np.ndarray) -> np.ndarray:
    return np.sinc(x)


def _lanczos(x: np.ndarray, taps: int = 3) -> np.ndarray:
    return np.where(np.abs(x) < taps, _sinc(x) * _sinc(x / taps), 0.0)


def _triangle(x: np.ndarray) -> np.ndarray:
    return np.maximum(0.0, 1.0 - np.abs(x))


def _box(x: np.ndarray) -> np.ndarray:
    return ((x >= -0.5) & (x < 0.5)).astype(np.float64)


_KERNELS = {
    # (function, support, default antialias)
    "bicubic_torch": (lambda x: _cubic(x, -0.75), 2.0),
    "bicubic": (lambda x: _cubic(x, -0.5), 2.0),  # PIL convention
    "lanczos": (_lanczos, 3.0),
    "bilinear": (_triangle, 1.0),
    "nearest": (_box, 0.5),
}


@functools.lru_cache(maxsize=256)
def _resize_weights(
    in_size: int, out_size: int, kernel: str, antialias: bool, edge: str = "clamp"
) -> np.ndarray:
    """Dense [out_size, in_size] resampling matrix, rows summing to 1.

    Source coordinates follow the half-pixel convention used by both PIL and
    torch's ``align_corners=False``:  ``src = (dst + 0.5) * scale - 0.5``.
    With ``antialias`` the kernel support is stretched by the downscale
    factor (PIL semantics); without, the kernel is applied at unit scale
    (torch ``interpolate`` semantics).

    ``edge='clamp'`` accumulates out-of-range taps on the border pixel
    (torch ``interpolate``'s index clamping); ``edge='shrink'`` restricts the
    window to valid pixels and renormalises over it (PIL's behaviour).
    """
    fn, support = _KERNELS[kernel]
    scale = in_size / out_size
    filter_scale = max(scale, 1.0) if antialias else 1.0
    r = support * filter_scale

    w = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale - 0.5
        if edge == "shrink":
            # PIL window: [max(0, center - r + 0.5), min(in, center + r + 0.5))
            lo = max(0, int(center - r + 0.5))
            hi = min(in_size, int(center + r + 0.5))
            taps = np.arange(lo, hi)
            vals = fn((taps - center) / filter_scale)
            s = vals.sum()
            if s != 0:
                vals = vals / s
            w[i, lo:hi] = vals
        else:
            lo = int(math.floor(center - r)) if kernel != "nearest" else int(
                math.floor(center - r + 0.5)
            )
            hi = int(math.ceil(center + r)) + 1
            taps = np.arange(lo, hi)
            vals = fn((taps - center) / filter_scale)
            s = vals.sum()
            if s != 0:
                vals = vals / s
            np.add.at(w[i], np.clip(taps, 0, in_size - 1), vals)
    return w.astype(np.float32)


def resize2d(
    x: jnp.ndarray,
    out_hw: tuple[int, int],
    kernel: str = "bicubic_torch",
    antialias: bool = False,
    edge: str = "clamp",
) -> jnp.ndarray:
    """Separable 2D resize of the trailing two spatial dims of ``[..., H, W]``."""
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    wh = jnp.asarray(_resize_weights(h_in, h_out, kernel, antialias, edge))
    ww = jnp.asarray(_resize_weights(w_in, w_out, kernel, antialias, edge))
    y = jnp.einsum("oh,...hw->...ow", wh, x.astype(jnp.float32))
    y = jnp.einsum("pw,...ow->...op", ww, y)
    return y.astype(x.dtype)


def interpolate_like_torch(x: jnp.ndarray, out_hw: tuple[int, int], mode: str = "bicubic") -> jnp.ndarray:
    """``F.interpolate(..., align_corners=False)`` parity (no antialias)."""
    kernel = {"bicubic": "bicubic_torch", "bilinear": "bilinear", "nearest": "nearest"}[mode]
    return resize2d(x, out_hw, kernel=kernel, antialias=False)


def pil_resize_like(x: jnp.ndarray, out_hw: tuple[int, int], filt: str = "lanczos") -> jnp.ndarray:
    """``PIL.Image.resize`` parity: antialiased kernel (LANCZOS / BICUBIC)."""
    kernel = {"lanczos": "lanczos", "bicubic": "bicubic", "bilinear": "bilinear"}[filt]
    return resize2d(x, out_hw, kernel=kernel, antialias=True, edge="shrink")


# ---------------------------------------------------------------------------
# Gaussian blur (scipy.ndimage parity)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _gaussian_taps(sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(x: jnp.ndarray, sigma: float, truncate: float = 4.0) -> jnp.ndarray:
    """Separable Gaussian blur of ``[..., H, W]``, scipy 'reflect' boundary.

    scipy's ``mode='reflect'`` is symmetric half-sample reflection —
    ``jnp.pad(mode='symmetric')``.  Matches
    ``scipy.ndimage.gaussian_filter(hr, sigma)`` in the FastMRI degradation
    (``ResDif_execution.ipynb`` cell 22 ``_simulate_low_res``).
    """
    taps = jnp.asarray(_gaussian_taps(float(sigma), truncate))
    r = (taps.shape[0] - 1) // 2
    lead = x.ndim - 2
    pad = [(0, 0)] * lead + [(r, r), (r, r)]
    xp = jnp.pad(x.astype(jnp.float32), pad, mode="symmetric")
    # Convolve rows then columns via windowed matmul-free correlation.
    y = _correlate_axis(xp, taps, axis=-2)
    y = _correlate_axis(y, taps, axis=-1)
    return y.astype(x.dtype)


def _correlate_axis(x: jnp.ndarray, taps: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Valid 1D correlation along ``axis`` via stacked shifts (XLA-fusable)."""
    n = taps.shape[0]
    size = x.shape[axis] - n + 1
    out = None
    for i in range(n):
        sl = jax.lax.slice_in_dim(x, i, i + size, axis=axis)
        term = sl * taps[i]
        out = term if out is None else out + term
    return out


# ---------------------------------------------------------------------------
# Pixel shuffle / unshuffle
# ---------------------------------------------------------------------------

def pixel_shuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """[B, C*r^2, H, W] -> [B, C, H*r, W*r] (torch ``PixelShuffle`` layout)."""
    b, c, h, w = x.shape
    r = factor
    co = c // (r * r)
    x = x.reshape(b, co, r, r, h, w)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, co, h * r, w * r)


def pixel_unshuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """[B, C, H*r, W*r] -> [B, C*r^2, H, W] (torch ``PixelUnshuffle``)."""
    b, c, hr, wr = x.shape
    r = factor
    h, w = hr // r, wr // r
    x = x.reshape(b, c, h, r, w, r)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, c * r * r, h, w)
