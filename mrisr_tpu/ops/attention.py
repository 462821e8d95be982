"""Spatial attention ops: dense, q-chunked (memory-efficient), and Pallas.

The reference's HF-guided cross-attention materialises the full (HW)^2
attention tensor via einsum (``ResDif_execution.ipynb`` cell 8) — at 128x128
feature maps that is a 16384^2 matrix (1-4 GB).  TPU-native replacements:

* ``dense_attention`` — for small sequences (mid-block at 32x32): two MXU
  matmuls, XLA fuses the softmax.
* ``chunked_attention`` — ``lax.scan`` over query chunks; each step computes
  an exact row softmax against the full K/V (peak memory O(chunk * N)).
  Differentiable by construction (no custom VJP needed) and the per-chunk
  matmuls are MXU-shaped.  This is the training path for long sequences.
* ``flash_attention_tpu`` (ops/flash_attention.py) — Pallas online-softmax
  kernel used on TPU for large N at inference; numerically equivalent.

All inputs are ``[B, N, D]`` (already head-split if multi-head).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# Sequence length at or above which the chunked path is used.
CHUNK_THRESHOLD = 4096
DEFAULT_CHUNK = 512


def dense_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float) -> jnp.ndarray:
    logits = jnp.einsum("bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bnm,bmd->bnd", w, v)


def chunked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    chunk: int = DEFAULT_CHUNK,
) -> jnp.ndarray:
    """Exact attention with O(chunk * N) peak memory via ``lax.scan``."""
    b, n, d = q.shape
    if n % chunk != 0:
        return dense_attention(q, k, v, scale)
    nq = n // chunk
    qc = q.reshape(b, nq, chunk, d).transpose(1, 0, 2, 3)  # [nq, B, chunk, d]

    def step(_, q_blk):
        logits = jnp.einsum("bnd,bmd->bnm", q_blk, k, preferred_element_type=jnp.float32)
        logits = logits * scale
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return None, jnp.einsum("bnm,bmd->bnd", w, v)

    _, out = jax.lax.scan(step, None, qc)
    return out.transpose(1, 0, 2, 3).reshape(b, n, d)


def _attend(q, k, v, scale):
    n, m = q.shape[1], k.shape[1]
    if n >= CHUNK_THRESHOLD:
        # Pallas flash kernel on TPU; exact chunked lax fallback elsewhere.
        from mrisr_tpu.ops.flash_attention import flash_attention_tpu, flash_available

        if flash_available(n, m):
            return flash_attention_tpu(q, k, v, scale)
        if n % DEFAULT_CHUNK == 0:
            return chunked_attention(q, k, v, scale)
    return dense_attention(q, k, v, scale)


def spatial_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, num_heads: int = 1) -> jnp.ndarray:
    """Multi-head attention over flattened spatial tokens ``[B, N, C]``."""
    b, n, c = q.shape
    h = num_heads
    dh = c // h

    def split(x):
        return x.reshape(b, n, h, dh).transpose(0, 2, 1, 3).reshape(b * h, n, dh)

    out = _attend(split(q), split(k), split(v), 1.0 / math.sqrt(dh))
    return out.reshape(b, h, n, dh).transpose(0, 2, 1, 3).reshape(b, n, c)


def cross_attention_2d(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Single-head cross-attention ``[B, N, C]``, 1/sqrt(C) scaling.

    Matches the scaling of the reference ``HF_guided_CA`` einsum
    (division by sqrt(channel), cell 8).
    """
    c = q.shape[-1]
    return _attend(q, k, v, 1.0 / math.sqrt(c))
