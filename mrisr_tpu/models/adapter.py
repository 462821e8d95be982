"""T2I-Adapter (Adapter_XL shape), native Flax/NHWC.

Re-derivation of the reference's ``Adapter_XL``
(``src/adapters/modules.py:114-157``): PixelUnshuffle(8) on the condition
image, conv_in to 320 channels, then 4 stages of 3 plain ResNet blocks with
a stride-2 conv downsample at the start of stages 1-3; emits one feature map
per stage ([320, 640, 1280, 1280]) that the UNet adds into its down blocks
(``adapter_features`` argument of models/sd_unet.SDUNet).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from mrisr_tpu.ops.resize import pixel_unshuffle


class AdapterResnetBlock(nn.Module):
    """conv -> (conv3x3, relu, conv) + skip-conv residual (modules.py:79-111
    with sk=False: both in_conv and skep paths present)."""

    out_channels: int
    ksize: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.ksize // 2
        pad = ((p, p), (p, p))
        x_in = nn.Conv(self.out_channels, (self.ksize, self.ksize), padding=pad, name="in_conv")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", name="block1")(x_in)
        h = nn.relu(h)
        h = nn.Conv(self.out_channels, (self.ksize, self.ksize), padding=pad, name="block2")(h)
        skip = nn.Conv(self.out_channels, (self.ksize, self.ksize), padding=pad, name="skep")(x_in)
        return h + skip


class T2IAdapter(nn.Module):
    """``zero_out`` adds a zero-initialised 1x1 projection on each emitted
    feature map — a disclosed deviation from the reference shape (which has
    no zero-init): with it, an UNTRAINED adapter contributes exactly zero to
    the UNet (adapter == base), the same from-identity fine-tuning property
    the ControlNet gets from its zero convs.  Required for the phantom-scale
    trained-evidence leg (``eval/parity.py::run_phantom_latent``) where the
    base is small and easily destabilised by random additive features."""

    channels: Sequence[int] = (320, 640, 1280, 1280)
    num_res_blocks: int = 3
    cin: int = 192  # 3 channels x 8^2 after unshuffle
    ksize: int = 3
    unshuffle_factor: int = 8
    zero_out: bool = False

    @nn.compact
    def __call__(self, cond: jnp.ndarray) -> list[jnp.ndarray]:
        # NHWC -> NCHW for the unshuffle op, back to NHWC after
        x = pixel_unshuffle(cond.transpose(0, 3, 1, 2), self.unshuffle_factor)
        x = x.transpose(0, 2, 3, 1)
        x = nn.Conv(self.channels[0], (3, 3), padding="SAME", name="conv_in")(x)
        features = []
        for i, c in enumerate(self.channels):
            for j in range(self.num_res_blocks):
                if i > 0 and j == 0:
                    # downsample keeps input channel count (reference
                    # Downsample at src/adapters/modules.py:52-76)
                    x = nn.Conv(
                        x.shape[-1],
                        (3, 3),
                        strides=(2, 2),
                        padding=((1, 1), (1, 1)),
                        name=f"body_{i}_{j}_down",
                    )(x)
                x = AdapterResnetBlock(c, self.ksize, name=f"body_{i}_{j}")(x)
            if self.zero_out:
                features.append(
                    nn.Conv(
                        c, (1, 1), kernel_init=nn.initializers.zeros,
                        name=f"out_proj_{i}",
                    )(x)
                )
            else:
                features.append(x)
        return features
