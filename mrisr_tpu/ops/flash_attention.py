"""Pallas flash-attention kernels (forward + backward) for TPU.

Replaces the reference's materialised (HW)^2 attention einsum
(``ResDif_execution.ipynb`` cell 8 ``HF_guided_CA``) with online-softmax
tiled kernels: the scores tile lives only in VMEM, statistics (running max,
running sum, unnormalised accumulator) persist across KV tiles in VMEM
scratch, fp32 accumulation throughout.

Forward also emits the per-row logsumexp so the backward runs as two Pallas
kernels (FlashAttention-2 style): a dq pass over KV blocks and a dk/dv pass
over Q blocks, both recomputing probabilities from the saved statistics
instead of materialising the score matrix.  Numerics are pinned against the
dense/chunked references in tests/test_flash_attention.py (interpreter mode)
and on real hardware in tests/test_flash_tpu.py.

Scope: non-causal single-segment attention on ``[B, N, D]`` with N a
multiple of the block size and D <= 128.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mrisr_tpu.ops.attention import chunked_attention

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)

# Block-size tuning knobs (benchmarked end-to-end via bench.py on v5e —
# see PERF.md; larger KV blocks amortise the online-softmax statistics).
DEFAULT_BLOCK_Q = int(os.environ.get("MRISR_FLASH_BQ", "2048"))
DEFAULT_BLOCK_K = int(os.environ.get("MRISR_FLASH_BK", "1024"))
DEFAULT_BWD_BLOCK = int(os.environ.get("MRISR_FLASH_BWD_BLOCK", "512"))
# Pad head dim to the 128-lane boundary inside the kernel; measured neutral
# on v5e (the MXU charges K<128 contractions as a full pass), so default off.
PAD_D = os.environ.get("MRISR_FLASH_PAD_D", "0") == "1"
# Experimental: compute the softmax exponentials in bf16. Measured NEUTRAL
# end-to-end on v5e (7.82 vs 7.86 slices/s/chip) — the VPU runs bf16 exp at
# the fp32 rate — so this stays off; kept for future hardware.
FAST_EXP = os.environ.get("MRISR_FLASH_FAST_EXP", "0") == "1"
# Experimental: run the online softmax in base-2 (scores pre-scaled by
# log2(e), exponentials via exp2). Mathematically identical; saves one
# multiply per exp IF the VPU's exp is not already exp2+mul under the hood.
EXP2 = os.environ.get("MRISR_FLASH_EXP2", "0") == "1"
LOG2E = 1.4426950408889634
# Keep the probability tile in bf16 end-to-end: exp computes on bf16 and the
# result feeds the PV matmul directly (it was cast to bf16 for the MXU anyway;
# the old FAST_EXP round-tripped bf16->fp32->bf16).  The softmax denominator
# still accumulates in fp32.  Measured NEUTRAL on v5e (8.43 vs 8.25 ms at the
# 128^2 site) — kept off.
P_BF16 = os.environ.get("MRISR_FLASH_P_BF16", "0") == "1"
# Fold the 1/sqrt(d) scale into Q before the kernel instead of multiplying
# every [bq, bk] score tile by it (one fewer VPU op per score element; the
# kernel is VPU-bound).  Measured -10% at the 128^2 site on v5e
# (8.25 -> 7.46 ms, tools/perf_layout2.py) — ON by default.
PRESCALE_Q = os.environ.get("MRISR_FLASH_PRESCALE_Q", "1") == "1"
# Compute the softmax denominator on the MXU instead of a VPU row-sum: append
# a ones column to V so the PV matmul emits sum_j p_ij in an output lane the
# MXU pads (and charges for) anyway; the accumulator's alpha-rescale then
# carries l with no separate statistics.  The denominator becomes a sum of
# the bf16-rounded p (the numerator already was), so outputs move ~1e-3
# relative vs the fp32-sum path — fine for bf16 pipelines.  Measured on the
# full 50-step chain (round 4, /tmp/chain_ab.py): 17.1 -> 16.6 ms/step
# (9.35 -> 9.63 slices/s), so ON by default; set MRISR_FLASH_V_AUG=0 for the
# fp32-denominator path.
V_AUG = os.environ.get("MRISR_FLASH_V_AUG", "1") == "1"
# Degree-2 polynomial exp2: exp2(x) = 2^round(x) * poly2(x - round(x)), the
# power of two applied by integer-adding round(x) into the float32 exponent
# field (Schraudolph-style, plus a minimax quadratic for the fraction).
# Max relative error 0.21% — BELOW the bf16 ulp (0.39%) that the probability
# tile is rounded to for the MXU anyway, so outputs stay within bf16
# rounding noise of the exact path.  Cuts the transcendental cost of the
# VPU-bound online softmax (~5 VPU ops vs the library exp).  The whole
# softmax runs in base 2 (scores pre-scaled by log2 e, like EXP2).
POLY_EXP = os.environ.get("MRISR_FLASH_POLY_EXP", "0") == "1"


def _poly_exp2(x):
    """Approximate exp2 for x <= 0 (see POLY_EXP).  fp32 in/out."""
    x = jnp.maximum(x, -126.0)  # keep the exponent-field add in range
    n = jnp.round(x)
    f = x - n  # in [-0.5, 0.5]
    p = 1.0005032 + f * (0.70494148 + f * 0.23919028)
    pi = jax.lax.bitcast_convert_type(p, jnp.int32)
    r = pi + n.astype(jnp.int32) * jnp.int32(1 << 23)
    return jax.lax.bitcast_convert_type(r, jnp.float32)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr, *, scale, kv_steps,
    prescaled=False,
):
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
    # In EXP2/POLY_EXP mode the whole online softmax runs in base 2 (the
    # statistics are log2-scaled); exp2(x*log2e) == exp(x), identical result.
    base2 = EXP2 or POLY_EXP
    eff_scale = scale * LOG2E if base2 else scale
    if not prescaled and eff_scale != 1.0:  # PRESCALE_Q folds it into Q outside
        s = s * eff_scale
    expf = _poly_exp2 if POLY_EXP else (jnp.exp2 if EXP2 else jnp.exp)

    m_prev = m_scr[:, :1]  # [bq, 1]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = expf(m_prev - m_next)
    if POLY_EXP:  # fp32 in/out (integer bitcast trick)
        p = expf(s - m_next)
    elif P_BF16:
        p = expf((s - m_next).astype(jnp.bfloat16))  # stays bf16 for the MXU
    elif FAST_EXP:
        p = expf((s - m_next).astype(jnp.bfloat16)).astype(jnp.float32)
    else:
        p = expf(s - m_next)
    m_scr[:, :1] = m_next  # single-lane write: the max lives in column 0

    if V_AUG:
        # V carries a trailing ones column: the PV dot emits the running
        # denominator in acc's last column and alpha rescales it for free.
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
    else:
        p_sum = jnp.sum(
            p.astype(jnp.float32) if p.dtype != jnp.float32 else p,
            axis=1, keepdims=True,
        )
        l_scr[:, :1] = alpha * l_scr[:, :1] + p_sum
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(kv_idx == kv_steps - 1)
    def _store():
        acc = acc_scr[...]
        if V_AUG:
            l = acc[:, acc.shape[1] - 1 :]
            out = acc[:, : acc.shape[1] - 1]
        else:
            l = l_scr[:, :1]
            out = acc
        l_col = l[:, 0]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (out * l_inv).astype(o_ref.dtype)
        # lse is always stored in natural-log units (the backward kernels
        # assume it); in base-2 modes the running max is log2-scaled.
        m_nat = m_scr[:, 0] * (1.0 / LOG2E) if (EXP2 or POLY_EXP) else m_scr[:, 0]
        lse_ref[0, 0, :] = m_nat + jnp.log(jnp.maximum(l_col, 1e-37))


def _flash_forward(q, k, v, scale, block_q, block_k, interpret=False):
    b, n, d = q.shape
    m = k.shape[1]
    assert n % block_q == 0 and m % block_k == 0, (
        f"flash blocks must tile the sequence: n={n} bq={block_q} m={m} bk={block_k}"
    )
    kv_steps = m // block_k

    prescaled = PRESCALE_Q
    if prescaled:
        eff = scale * LOG2E if (EXP2 or POLY_EXP) else scale
        q = (q.astype(jnp.float32) * eff).astype(q.dtype)

    dv = d
    if V_AUG:
        v = jnp.concatenate([v, jnp.ones_like(v[..., :1])], axis=-1)
        dv = d + 1

    grid = (b, n // block_q, kv_steps)
    out, lse = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, kv_steps=kv_steps, prescaled=prescaled
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), q.dtype),
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, dv), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, qi, ki: (b, 0, qi)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, dv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)
    return out, lse


# ---------------------------------------------------------------------------
# Backward (FlashAttention-2 style, probabilities recomputed from lse)
# ---------------------------------------------------------------------------


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr, *, scale, kv_steps
):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [bk, d]
    v = v_ref[0]  # [bk, d]
    do = do_ref[0].astype(jnp.float32)  # [bq, d]
    lse = lse_ref[0, 0].reshape(-1, 1)  # [bq, 1]
    delta = delta_ref[0, 0].reshape(-1, 1)  # [bq, 1] = rowsum(do * o)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [bq, bk]
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bq, bk]
    ds = p * (dp - delta)
    dq_scr[...] += scale * jax.lax.dot(
        ds.astype(k.dtype), k, preferred_element_type=jnp.float32
    )

    @pl.when(kv_idx == kv_steps - 1)
    def _store():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_scr, dv_scr, *, scale, q_steps
):
    q_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [bk, d]
    v = v_ref[0]  # [bk, d]
    do = do_ref[0].astype(jnp.float32)  # [bq, d]
    lse = lse_ref[0, 0].reshape(1, -1)  # [1, bq]
    delta = delta_ref[0, 0].reshape(1, -1)  # [1, bq]

    # s^T tile: [bk, bq]
    st = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    pt = jnp.exp(st - lse)  # [bk, bq]
    dv_scr[...] += jax.lax.dot(
        pt.astype(do.dtype), do, preferred_element_type=jnp.float32
    )
    dpt = jax.lax.dot_general(
        v.astype(jnp.float32), do, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bk, bq]
    dst = pt * (dpt - delta)
    dk_scr[...] += scale * jax.lax.dot(
        dst.astype(q.dtype), q, preferred_element_type=jnp.float32
    )

    @pl.when(q_idx == q_steps - 1)
    def _store():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _flash_backward(q, k, v, o, lse, do, scale, block, interpret=False):
    """dq/dk/dv kernels (FlashAttention-2 style, p recomputed from lse).

    Numerics note (ADVICE round-1): with ``PRESCALE_Q`` on (the default)
    the forward folds ``scale`` (times log2e in exp2 modes) into a bf16
    re-rounded Q, while these kernels recompute probabilities from the raw
    saved Q with exact fp32 scaling against the forward's lse — whose
    denominator under ``V_AUG`` is itself a sum of bf16-rounded p.  The
    gradients therefore carry a small systematic mismatch vs the forward
    softmax beyond plain kernel rounding; acceptable for the bf16 serving
    focus (tolerance-tested), but the fwd/bwd pair is only bf16-consistent
    under the default flags — training at tighter precision should set
    ``MRISR_FLASH_PRESCALE_Q=0``/``MRISR_FLASH_V_AUG=0`` or use fp32.
    """
    b, n, d = q.shape
    m = k.shape[1]
    bq = min(block, n)
    bk = min(block, m)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)[:, None, :]  # [b, 1, n]

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, kv_steps=m // bk),
        out_shape=jax.ShapeDtypeStruct((b, n, d), q.dtype),
        grid=(b, n // bq, m // bk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, bk, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bq, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, 1, bq), lambda b, qi, ki: (b, 0, qi)),
            pl.BlockSpec((1, 1, bq), lambda b, qi, ki: (b, 0, qi)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, qi, ki: (b, qi, 0)),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, q_steps=n // bq),
        out_shape=(
            jax.ShapeDtypeStruct((b, m, d), k.dtype),
            jax.ShapeDtypeStruct((b, m, d), v.dtype),
        ),
        grid=(b, m // bk, n // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, bk, d), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, bq, d), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, 1, bq), lambda b, ki, qi: (b, 0, qi)),
            pl.BlockSpec((1, 1, bq), lambda b, ki, qi: (b, 0, qi)),
        ],
        out_specs=(
            pl.BlockSpec((1, bk, d), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda b, ki, qi: (b, ki, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public entry point with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_tpu(
    q, k, v, scale: float, block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K
):
    """Online-softmax attention, [B, N, D] -> [B, N, D].

    N (and KV length) must divide the block sizes — the callers in
    ops/attention.py guarantee this or fall back to the chunked path.
    """
    out, _ = _flash_fwd_impl(q, k, v, scale, block_q, block_k)
    return out


def _pad_d(x):
    d = x.shape[-1]
    if not PAD_D:
        return x, d
    pad = (-d) % 128
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
    return x, d


def _effective_blocks(n: int, m: int, itemsize: int, block_q: int, block_k: int):
    """Clamp kernel blocks to the sequence AND to the scoped-VMEM budget.

    With fp32 inputs the probability tile is kept fp32 for the PV matmul, so
    the score + probability tiles cost ``2 * bq * bk * 4`` bytes — at the
    default 2048x1024 blocks that is 16 MB and overflows the 16 MB scoped
    VMEM (observed as a hard compile error on v5e).  Halving block_q keeps
    fp32 inside the budget; n % 2048 == 0 implies n % 1024 == 0, so the
    divisibility contract of ``flash_available`` is preserved.
    """
    block_q = min(block_q, n)
    block_k = min(block_k, m)
    if itemsize >= 4 and block_q > 1024 and n % 1024 == 0:
        block_q = 1024
    return block_q, block_k


def _flash_fwd_impl(q, k, v, scale, block_q, block_k, interpret=False):
    qp, d = _pad_d(q)
    kp, _ = _pad_d(k)
    vp, _ = _pad_d(v)
    block_q, block_k = _effective_blocks(
        qp.shape[1], kp.shape[1], jnp.dtype(q.dtype).itemsize, block_q, block_k
    )
    out, lse = _flash_forward(qp, kp, vp, scale, block_q, block_k, interpret)
    return out[..., :d], lse


def _flash_fwd(q, k, v, scale, block_q, block_k):
    out, lse = _flash_fwd_impl(q, k, v, scale, block_q, block_k)
    return out, (q, k, v, out, lse)


def _flash_bwd(scale, block_q, block_k, res, g):
    q, k, v, o, lse = res
    qp, _ = _pad_d(q)
    kp, _ = _pad_d(k)
    vp, _ = _pad_d(v)
    op, _ = _pad_d(o)
    gp, d = _pad_d(g)
    dq, dk, dv = _flash_backward(qp, kp, vp, op, lse, gp, scale, DEFAULT_BWD_BLOCK)
    return dq[..., :d], dk[..., :d], dv[..., :d]


flash_attention_tpu.defvjp(_flash_fwd, _flash_bwd)


def flash_attention_reference_vjp(q, k, v, scale):
    """Exact chunked-lax attention (differentiable reference for tests)."""
    return chunked_attention(q, k, v, scale)


def flash_available(n: int, m: int) -> bool:
    """Gate must mirror the ACTUAL kernel block clamping: the kernel runs
    with block_q = min(DEFAULT_BLOCK_Q, n) and block_k = min(DEFAULT_BLOCK_K, m),
    so divisibility is checked against those clamped sizes."""
    try:
        return (
            jax.default_backend() == "tpu"
            and n % min(DEFAULT_BLOCK_Q, n) == 0
            and m % min(DEFAULT_BLOCK_K, m) == 0
            and n >= 1024
        )
    except Exception:
        return False
