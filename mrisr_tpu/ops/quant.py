"""Dynamic int8 quantized convolution for the TPU serving profile.

The v5e MXU executes s8 x s8 -> s32 at twice the bf16 rate (394 vs 197
TOPS), and after the kv-pooled fast profile removed the attention cost the
ResDiff sampler step is conv-FLOP-bound (PERF.md round 6: pooled CA ~1 ms,
conv path ~6 of 8.3 ms/step).  This module quantizes a conv's operands on
the fly — per-tensor symmetric scale for the activation, per-output-channel
symmetric scales for the kernel — runs the convolution in int8 with int32
accumulation, and dequantizes into the activation dtype.  No parameters
change: quantization happens at apply time, so the SAME checkpoint serves
the exact, kv-pooled, and int8 profiles (the ``ca_kv_pool`` pattern —
models/resdiff_unet.py).

Numerics: activations here follow GroupNorm+SiLU, so the per-tensor range
is tight and symmetric-ish; the worst-case absolute quantization step is
``amax/127`` per tensor and ``amax_c/127`` per kernel channel.  Fidelity is
validated end-to-end through the parity harness, not assumed (see the
PARITY fast-profile evidence convention).

The extra cost is one abs-max reduce plus one elementwise scale/round pass
over each operand — O(bytes) against the conv's O(FLOPs); at the ResDiff
conv shapes that is microseconds against a 0.1-0.5 ms conv.

Reference counterpart: none — the reference serves fp16 CUDA through torch
(SURVEY.md §2 "Native/C++/CUDA components" row); int8 is the TPU-native
equivalent of that serving-precision headroom.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_per_tensor(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-tensor int8 quantization: ``x ≈ q * scale``."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
    q = jnp.round(xf / scale).astype(jnp.int8)
    return q, scale


def quantize_per_out_channel(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 quantization of an HWIO kernel."""
    wf = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2)), 1e-8) / 127.0  # [O]
    q = jnp.round(wf / scale).astype(jnp.int8)
    return q, scale


def int8_conv(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    window_strides: tuple[int, int] = (1, 1),
    padding="SAME",
) -> jnp.ndarray:
    """Stride-``window_strides`` NHWC/HWIO conv with int8 MXU execution.

    ``x`` [B, H, W, I] (any float dtype), ``w`` [kh, kw, I, O].  Returns the
    dequantized result in ``x.dtype``.  Accumulation is int32 (worst case
    ``kh*kw*I * 127^2`` stays far below 2^31 at every shape in this repo).
    """
    xq, sx = quantize_per_tensor(x)
    wq, sw = quantize_per_out_channel(w)
    out = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides,
        padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = out.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)
