"""Stage-1 SimpleCNN: SRCNN-style low-frequency predictor.

Native Flax/NHWC rebuild of the grayscale Stage-1 CNN
(``ResDif_execution.ipynb`` cell 28): conv(1->64) ReLU, conv(64->32) ReLU,
conv(32->scale^2) pixel-shuffle, plus the bicubic-upsampled input as a
residual.  The reference runs it at ``scale_factor=1`` (the SR task is
quality transfer on a shared grid — SURVEY.md §2 slicer row).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mrisr_tpu.ops.resize import interpolate_like_torch


class SimpleCNN(nn.Module):
    """Input/output NHWC ``[B, H, W, 1]`` -> ``[B, H*s, W*s, 1]``."""

    scale_factor: int = 1
    hidden: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self.scale_factor
        b, h, w, c = x.shape
        if s == 1:
            x_up = x
        else:
            # torch F.interpolate(..., scale_factor=s, mode='bicubic') parity
            nchw = x.transpose(0, 3, 1, 2)
            up = interpolate_like_torch(nchw, (h * s, w * s))
            x_up = up.transpose(0, 2, 3, 1)
        y = nn.Conv(self.hidden, (3, 3), padding="SAME")(x)
        y = nn.relu(y)
        y = nn.Conv(self.hidden // 2, (3, 3), padding="SAME")(y)
        y = nn.relu(y)
        y = nn.Conv(c * s * s, (3, 3), padding="SAME")(y)
        if s > 1:
            # NHWC pixel shuffle: [B, H, W, C*s*s] -> [B, H*s, W*s, C]
            y = y.reshape(b, h, w, s, s, c)
            y = y.transpose(0, 1, 3, 2, 4, 5)
            y = y.reshape(b, h * s, w * s, c)
        return y + x_up
