"""Synthetic low-field degradation (FastMRI path).

Semantics of ``_simulate_low_res`` (``ResDif_execution.ipynb`` cell 22):
Gaussian blur with sigma = 0.5 * scale (scipy, reflect boundary), then
PIL-BICUBIC downsample by ``scale`` and BICUBIC upsample back.

Two implementations:

* :func:`simulate_low_res` — batched JAX, runs on device; used to degrade
  whole mesh-sharded batches without host round-trips.
* :func:`simulate_low_res_np` — numpy/PIL reference for offline
  preprocessing and parity tests.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mrisr_tpu.ops.resize import gaussian_blur, pil_resize_like


def simulate_low_res(hr: jnp.ndarray, scale: float = 4.0) -> jnp.ndarray:
    """``hr``: [..., H, W] in any range; returns same-shape degraded copy."""
    h, w = hr.shape[-2], hr.shape[-1]
    sigma = 0.5 * scale
    blurred = gaussian_blur(hr, sigma)
    small = (int(h // scale), int(w // scale))
    lr = pil_resize_like(blurred, small, filt="bicubic")
    return pil_resize_like(lr, (h, w), filt="bicubic")


def simulate_low_res_np(hr: np.ndarray, scale: float = 4.0) -> np.ndarray:
    from PIL import Image
    from scipy.ndimage import gaussian_filter

    blurred = gaussian_filter(hr.astype(np.float32), sigma=0.5 * scale)
    pil = Image.fromarray(blurred)
    h, w = hr.shape
    small = (int(w // scale), int(h // scale))  # PIL size is (W, H)
    lr = pil.resize(small, resample=Image.BICUBIC)
    up = lr.resize((w, h), resample=Image.BICUBIC)
    return np.asarray(up)
