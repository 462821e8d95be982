"""Small time-conditioned UNet for the MNIST 14->28 toy SR task.

The reference notebook (``MNIST_Super_Resolution.ipynb`` cells 6-9) sketches
a DDPM UNet but its training loop actually runs plain MSE regression and the
model code has unresolved names, so it does not run as-is (SURVEY.md §2
"MNIST toy SR" row).  This module supports both intended modes:

* regression: ``model(upsample(lr))`` -> HR directly (what the reference ran)
* ddpm: ``model(concat(x_t, upsample(lr)), t)`` -> predicted noise
  (what the reference scaffolding intended), with optional class labels.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from mrisr_tpu.models.layers import (
    ResnetBlock,
    SinusoidalTimeEmbedding,
    Downsample,
    Upsample,
)


class MNISTUNet(nn.Module):
    channels: Sequence[int] = (32, 64, 128)
    time_dim: int = 64
    out_channels: int = 1
    num_classes: int = 0  # 0 = unconditional
    groups: int = 8

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray | None = None,
        y: jnp.ndarray | None = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        emb = None
        if t is not None:
            emb = SinusoidalTimeEmbedding(self.time_dim)(t)
            emb = nn.Dense(self.time_dim)(emb)
            emb = nn.relu(emb)
        if y is not None and self.num_classes > 0:
            cls = nn.Embed(self.num_classes, self.time_dim)(y)
            emb = cls if emb is None else emb + cls
        if emb is not None:
            # keep a bf16 forward bf16 (fp32 sin/cos encoding would promote)
            emb = emb.astype(x.dtype)

        h = nn.Conv(self.channels[0], (3, 3), padding="SAME")(x)
        skips = []
        for i, ch in enumerate(self.channels):
            h = ResnetBlock(ch, self.groups)(h, emb, deterministic)
            skips.append(h)
            if i != len(self.channels) - 1:
                h = Downsample(ch)(h)

        h = ResnetBlock(self.channels[-1], self.groups)(h, emb, deterministic)

        for i, ch in enumerate(reversed(self.channels)):
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = ResnetBlock(ch, self.groups)(h, emb, deterministic)
            if i != len(self.channels) - 1:
                h = Upsample(ch)(h)

        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5)(h)  # torch GN default
        h = nn.swish(h)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME")(h)
