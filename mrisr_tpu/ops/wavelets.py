"""Haar discrete wavelet transform as fixed 2x2 block transforms.

The reference's patched ResDiff UNet computes a multi-level Haar DWT of the
Stage-1 CNN image and sums the three band-pass sub-bands per level as
cross-attention queries (``ResDif_execution.ipynb`` cell 9, via
``pytorch_wavelets.DWTForward(J, 'haar', 'symmetric')``).

pytorch_wavelets is a torch-only dependency; for even-sized inputs the Haar
analysis filters are exactly a non-overlapping 2x2 block transform, so the
TPU-native implementation is a reshape + four weighted sums — no convolution
needed, fuses to trivial VPU work under XLA.

Convention (pywt haar): along an axis, approximation = (even + odd)/sqrt(2),
detail = (even - odd)/sqrt(2).  Band order follows the usual (LH, HL, HH) =
(horizontal, vertical, diagonal) detail ordering.  Inputs must have even
spatial sizes at every level (true for the 256/512 resolutions used here).
"""
from __future__ import annotations

import jax.numpy as jnp

_INV_SQRT2 = 0.7071067811865476


def haar_dwt_level(x: jnp.ndarray):
    """One DWT level of ``[..., H, W]`` -> (LL, (LH, HL, HH)), each ``[..., H/2, W/2]``."""
    h, w = x.shape[-2], x.shape[-1]
    assert h % 2 == 0 and w % 2 == 0, "haar DWT requires even spatial dims"
    lead = x.shape[:-2]
    x = x.reshape(*lead, h // 2, 2, w // 2, 2)
    a = x[..., 0, :, 0]  # even row, even col
    b = x[..., 0, :, 1]  # even row, odd col
    c = x[..., 1, :, 0]  # odd row, even col
    d = x[..., 1, :, 1]  # odd row, odd col
    ll = (a + b + c + d) * 0.5
    lh = (a - b + c - d) * 0.5  # detail along W (horizontal edges)
    hl = (a + b - c - d) * 0.5  # detail along H (vertical edges)
    hh = (a - b - c + d) * 0.5  # diagonal detail
    return ll, (lh, hl, hh)


def haar_dwt_highpass_sum(x: jnp.ndarray, levels: int):
    """Sum of the three band-pass sub-bands at each of ``levels`` DWT levels.

    Returns a list of ``levels`` arrays with halved spatial size per level —
    the query maps fed to HF-guided cross-attention (cell 9 semantics:
    ``YH[i][:, :, 0] + YH[i][:, :, 1] + YH[i][:, :, 2]``).
    """
    out = []
    cur = x
    for _ in range(levels):
        cur, (lh, hl, hh) = haar_dwt_level(cur)
        out.append(lh + hl + hh)
    return out
