"""Frequency-domain helpers for the ResDiff FD information splitter.

Replicates the math of the grayscale-patched ``FD_Info_Spliter``
(``ResDif_execution.ipynb`` cell 8): 2D FFT of the CNN estimate, a learned-
sigma Gaussian "high-pass" transfer function evaluated on a **centered**
frequency grid but applied to the **unshifted** FFT — a quirk of the
reference (inherited from upstream ResDiff) that effectively passes DC and
attenuates near-Nyquist content; replicated faithfully because the learned
sigma statistics were trained against it.

Deviation, documented: the reference calls ``torch.fft.fftn`` over *all*
dims of ``[B, 1, H, W]``, which equals a per-image 2D FFT only because its
training batch size is 1 (config cell 37).  We FFT over (H, W) only — the
sane generalisation that coincides with the reference at B=1.
"""
from __future__ import annotations

import jax.numpy as jnp


def centered_distance_grid(n: int, m: int) -> jnp.ndarray:
    """sqrt(u^2 + v^2) with u = row - n/2, v = col - m/2 (cell 8 grid)."""
    u = jnp.arange(n, dtype=jnp.float32) - n / 2.0
    v = jnp.arange(m, dtype=jnp.float32) - m / 2.0
    return jnp.sqrt(u[:, None] ** 2 + v[None, :] ** 2)


def gaussian_highpass_split(x: jnp.ndarray, sigma: jnp.ndarray):
    """Filter ``x`` [B, C, H, W] with H = 1 - exp(-D^2 / (2 sigma^2)).

    ``sigma``: per-sample scalars broadcastable to [B, 1, 1, 1].
    Returns ``(fft_filtered, spatial_highfreq)`` where ``spatial_highfreq``
    is ``|ifft2(fft_filtered)|`` (the reference's ``x_hf_feature``).
    """
    n, m = x.shape[-2], x.shape[-1]
    d = centered_distance_grid(n, m)
    sig = jnp.reshape(sigma, sigma.shape + (1,) * (x.ndim - sigma.ndim))
    h = 1.0 - jnp.exp(-(d**2) / (2.0 * sig**2))
    xf = jnp.fft.fft2(x.astype(jnp.float32))
    xf_filtered = xf * h
    hf = jnp.abs(jnp.fft.ifft2(xf_filtered))
    return xf_filtered, hf
