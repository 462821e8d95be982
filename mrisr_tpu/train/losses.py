"""Loss functions.

``image_compare_loss`` re-derives the spirit of the cloned ResDiff repo's
CNN pre-training loss (``ResDiff/pretrain_CNN/loss.py``, imported at
``ResDif_execution.ipynb`` cell 29 — the exact file lives only in the
runtime-cloned dependency): a pixel term plus a frequency-domain term so the
Stage-1 CNN learns the low-frequency structure while being penalised for
spectral error.  Weighting documented as an explicit assumption.
"""
from __future__ import annotations

import jax.numpy as jnp


def l2(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def frequency_l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean |FFT2 difference| over the spatial dims of NHWC images."""
    pf = jnp.fft.fft2(pred.astype(jnp.float32), axes=(1, 2))
    tf = jnp.fft.fft2(target.astype(jnp.float32), axes=(1, 2))
    return jnp.mean(jnp.abs(pf - tf))


def image_compare_loss(
    pred: jnp.ndarray, target: jnp.ndarray, freq_weight: float = 0.1
) -> jnp.ndarray:
    """Pixel MSE + ``freq_weight`` x normalised frequency L1 (assumption doc'd)."""
    n = pred.shape[1] * pred.shape[2]
    return l2(pred, target) + freq_weight * frequency_l1(pred, target) / n
