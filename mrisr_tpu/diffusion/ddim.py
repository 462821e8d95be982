"""DDIM sampling step (Song et al. 2021) with diffusers-style spacing.

The reference never ships a DDIM sampler, but BASELINE.json's headline metric
is "50-step DDIM 256x256"; the config (``ResDif_execution.ipynb`` cell 11)
pins ``timestep_spacing: trailing``.  This module provides the deterministic /
eta-parameterised step used by the fused ``lax.scan`` samplers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mrisr_tpu.diffusion.schedules import Schedule, extract
from mrisr_tpu.diffusion.ddpm import predict_x0_from_eps


def ddim_step(
    sched: Schedule,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    t_prev: jnp.ndarray,
    eps_pred: jnp.ndarray,
    key: jax.Array | None = None,
    eta: float = 0.0,
    clip_x0: bool = True,
) -> jnp.ndarray:
    """One DDIM step from timestep ``t`` to ``t_prev``.

    ``t_prev < 0`` denotes the final step to x0 (alpha_bar_prev = 1).
    """
    ac_t = extract(sched.alphas_cumprod, t, x_t.ndim)
    ac_prev = jnp.where(
        jnp.reshape(t_prev, jnp.shape(t_prev) + (1,) * (x_t.ndim - jnp.ndim(t_prev))) >= 0,
        extract(sched.alphas_cumprod, jnp.maximum(t_prev, 0), x_t.ndim),
        jnp.ones_like(ac_t),
    )

    x0 = predict_x0_from_eps(sched, x_t, t, eps_pred)
    if clip_x0:
        x0 = jnp.clip(x0, -1.0, 1.0)
    # Recompute eps from the (possibly clipped) x0 for consistency.
    eps = (x_t - jnp.sqrt(ac_t) * x0) / jnp.sqrt(1.0 - ac_t)

    sigma = eta * jnp.sqrt((1.0 - ac_prev) / (1.0 - ac_t)) * jnp.sqrt(1.0 - ac_t / ac_prev)
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - ac_prev - sigma**2, 0.0)) * eps
    x_prev = jnp.sqrt(ac_prev) * x0 + dir_xt
    if eta > 0.0:
        if key is None:
            raise ValueError("eta > 0 requires a PRNG key")
        noise = jax.random.normal(key, x_t.shape, jnp.float32)
        x_prev = x_prev + sigma * noise
    return x_prev.astype(x_t.dtype)  # keep lax.scan carry dtype stable
