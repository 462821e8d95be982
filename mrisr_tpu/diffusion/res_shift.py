"""Res-SRDiff residual-shifting diffusion process.

Native re-derivation of the reference's shifting math in
``src/adapters/res_srdiff.py``:

* forward (``get_res_shifting_latents``, res_srdiff.py:7-25):
  ``x_t = sqrt(ac_t) * HR + (1 - sqrt(ac_t)) * LR + sqrt(1 - ac_t) * eps``
* reverse (``log_validation``, res_srdiff.py:80-96): derive
  ``x0_pred = (x_t - (1 - sqrt(ac_t)) LR - sqrt(1 - ac_t) eps) / sqrt(ac_t)``,
  re-anchor ``x_{t-1} = sqrt(ac_prev) x0 + (1 - sqrt(ac_prev)) LR``, and add
  DDPM posterior variance noise
  ``sqrt((1-ac_prev)/(1-ac_t) * (1 - ac_t/ac_prev))`` when ``t_prev > 0``.

The branch on ``t_prev > 0`` is expressed with ``jnp.where`` so the whole
K-step sampler compiles as one ``lax.scan`` (SURVEY.md §7).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mrisr_tpu.diffusion.schedules import Schedule, extract


def shift_forward(
    sched: Schedule,
    hr: jnp.ndarray,
    lr: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Shifted forward process: move from HR toward LR as t grows."""
    ac = extract(sched.alphas_cumprod, t, hr.ndim)
    sa = jnp.sqrt(ac)
    mu = sa * hr + (1.0 - sa) * lr
    sigma = jnp.sqrt(1.0 - ac)
    return mu + sigma * noise


def predict_x0(
    sched: Schedule,
    x_t: jnp.ndarray,
    lr: jnp.ndarray,
    t: jnp.ndarray,
    eps_pred: jnp.ndarray,
) -> jnp.ndarray:
    ac = extract(sched.alphas_cumprod, t, x_t.ndim)
    sa = jnp.sqrt(ac)
    return (x_t - (1.0 - sa) * lr - jnp.sqrt(1.0 - ac) * eps_pred) / sa


def shift_reverse_step(
    sched: Schedule,
    x_t: jnp.ndarray,
    lr: jnp.ndarray,
    t: jnp.ndarray,
    t_prev: jnp.ndarray,
    model_out: jnp.ndarray,
    key: jax.Array,
    prediction_type: str = "epsilon",
) -> jnp.ndarray:
    """One reverse shifting step, branch-free over ``t_prev > 0``.

    ``prediction_type`` follows diffusers' scheduler convention:
    ``"epsilon"`` (the reference SD1.5 setting — ``model_out`` is the noise,
    x0 derived via :func:`predict_x0`) or ``"sample"`` (``model_out`` IS the
    x0 prediction).  The reverse transition itself is identical.  "sample"
    matters for from-scratch small-scale training: deriving x0 from an
    eps prediction divides the eps error by ``sqrt(ac_t)`` — x14 at
    SD1.5's t=950 — which a pretrained SD-class eps model absorbs but a
    phantom-scale one does not (PERF.md round-13 / parity harness notes).
    """
    ac_t = extract(sched.alphas_cumprod, t, x_t.ndim)
    ac_prev = extract(sched.alphas_cumprod, jnp.maximum(t_prev, 0), x_t.ndim)

    if prediction_type == "sample":
        x0 = model_out
    elif prediction_type == "epsilon":
        x0 = predict_x0(sched, x_t, lr, t, model_out)
    else:
        raise ValueError(f"unknown prediction_type {prediction_type!r}")
    sa_prev = jnp.sqrt(ac_prev)
    x_prev = sa_prev * x0 + (1.0 - sa_prev) * lr

    variance = jnp.sqrt(
        jnp.maximum((1.0 - ac_prev) / (1.0 - ac_t) * (1.0 - ac_t / ac_prev), 0.0)
    )
    noise = jax.random.normal(key, x_t.shape, jnp.float32)
    add = (t_prev > 0).astype(jnp.float32)
    add = jnp.reshape(add, add.shape + (1,) * (x_t.ndim - add.ndim))
    out = x_prev + add * variance * noise
    return out.astype(x_t.dtype)  # keep lax.scan carry dtype stable
