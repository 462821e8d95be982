"""Pallas flash-attention forward kernel for TPU.

Replaces the reference's materialised (HW)^2 attention einsum
(``ResDif_execution.ipynb`` cell 8 ``HF_guided_CA``) with an online-softmax
tiled kernel: the scores tile lives only in VMEM, statistics (running max,
running sum, unnormalised accumulator) persist across KV tiles in VMEM
scratch, fp32 accumulation throughout (see /opt/skills/guides docs for the
pattern).

Scope: non-causal single-segment attention on ``[B, N, D]`` with N a
multiple of the block size and D <= 128 (padded to 128 lanes).  The backward
pass reuses the exact-equivalent chunked lax implementation via custom_vjp —
numerically identical function, so gradients are exact.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mrisr_tpu.ops.attention import chunked_attention

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)

# Block-size tuning knobs (benchmarked via bench.py on the target chip).
import os

DEFAULT_BLOCK_Q = int(os.environ.get("MRISR_FLASH_BQ", "2048"))
DEFAULT_BLOCK_K = int(os.environ.get("MRISR_FLASH_BK", "1024"))
# Pad head dim to the 128-lane boundary inside the kernel (default); set
# MRISR_FLASH_PAD_D=0 to hand Mosaic the raw d<128 tiles instead.
PAD_D = os.environ.get("MRISR_FLASH_PAD_D", "0") == "1"


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale, kv_steps):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [bk, d]
    v = v_ref[0]  # [bk, d]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]
    s = s * scale

    m_prev = m_scr[:, :1]  # [bq, 1]
    l_prev = l_scr[:, :1]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)

    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )

    @pl.when(kv_idx == kv_steps - 1)
    def _store():
        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


def _flash_forward(q, k, v, scale, block_q, block_k):
    b, n, d = q.shape
    m = k.shape[1]
    kv_steps = m // block_k

    grid = (b, n // block_q, kv_steps)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_steps=kv_steps),
        out_shape=jax.ShapeDtypeStruct((b, n, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_tpu(
    q, k, v, scale: float, block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K
):
    """Online-softmax attention, [B, N, D] -> [B, N, D].

    Pads D to the 128-lane boundary internally (zero columns contribute
    nothing to scores; padded V columns are sliced off).  N (and KV length)
    must divide the block sizes — the callers in ops/attention.py guarantee
    this or fall back to the chunked path.
    """
    return _flash_fwd_impl(q, k, v, scale, block_q, block_k)


def _pad_d(x):
    d = x.shape[-1]
    if not PAD_D:
        return x, d
    pad = (-d) % 128
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
    return x, d


def _flash_fwd_impl(q, k, v, scale, block_q, block_k):
    qp, d = _pad_d(q)
    kp, _ = _pad_d(k)
    vp, _ = _pad_d(v)
    block_q = min(block_q, qp.shape[1])
    block_k = min(block_k, kp.shape[1])
    out = _flash_forward(qp, kp, vp, scale, block_q, block_k)
    return out[..., :d]


def _flash_fwd(q, k, v, scale, block_q, block_k):
    return _flash_fwd_impl(q, k, v, scale, block_q, block_k), (q, k, v)


def _flash_bwd(scale, block_q, block_k, res, g):
    q, k, v = res
    # Exact same function via the differentiable chunked implementation.
    _, vjp = jax.vjp(lambda q_, k_, v_: chunked_attention(q_, k_, v_, scale), q, k, v)
    return vjp(g)


flash_attention_tpu.defvjp(_flash_fwd, _flash_bwd)


def flash_available(n: int, m: int, block: int = 512) -> bool:
    try:
        return (
            jax.default_backend() == "tpu"
            and n % min(block, n) == 0
            and m % min(block, m) == 0
            and n >= 1024
        )
    except Exception:
        return False
