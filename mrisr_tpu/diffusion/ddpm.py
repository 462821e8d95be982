"""DDPM forward/reverse process math (pure functions, jit-friendly).

Semantics follow the standard Ho et al. 2020 formulation used by the
reference's MNIST notebook scaffolding (``MNIST_Super_Resolution.ipynb`` cell
5) and by diffusers' ``DDPMScheduler`` on the latent path.  Everything is
expressed on arbitrary-layout arrays; timesteps broadcast via
``schedules.extract``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mrisr_tpu.diffusion.schedules import Schedule, extract


def q_sample(sched: Schedule, x0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """Diffuse ``x0`` to timestep ``t``: ``sqrt(ac_t) x0 + sqrt(1-ac_t) eps``."""
    a = extract(sched.sqrt_alphas_cumprod, t, x0.ndim)
    s = extract(sched.sqrt_one_minus_alphas_cumprod, t, x0.ndim)
    return a * x0 + s * noise


def predict_x0_from_eps(sched: Schedule, x_t, t, eps):
    a = extract(sched.sqrt_alphas_cumprod, t, x_t.ndim)
    s = extract(sched.sqrt_one_minus_alphas_cumprod, t, x_t.ndim)
    return (x_t - s * eps) / a


def predict_eps_from_x0(sched: Schedule, x_t, t, x0):
    a = extract(sched.sqrt_alphas_cumprod, t, x_t.ndim)
    s = extract(sched.sqrt_one_minus_alphas_cumprod, t, x_t.ndim)
    return (x_t - a * x0) / s


def predict_v(sched: Schedule, x0, t, eps):
    """v-prediction target (Salimans & Ho 2022): v = a*eps - s*x0."""
    a = extract(sched.sqrt_alphas_cumprod, t, x0.ndim)
    s = extract(sched.sqrt_one_minus_alphas_cumprod, t, x0.ndim)
    return a * eps - s * x0


def predict_x0_from_v(sched: Schedule, x_t, t, v):
    a = extract(sched.sqrt_alphas_cumprod, t, x_t.ndim)
    s = extract(sched.sqrt_one_minus_alphas_cumprod, t, x_t.ndim)
    return a * x_t - s * v


def posterior_mean_variance(sched: Schedule, x0, x_t, t):
    """Mean and (log-)variance of q(x_{t-1} | x_t, x0)."""
    mean = (
        extract(sched.posterior_mean_coef1, t, x_t.ndim) * x0
        + extract(sched.posterior_mean_coef2, t, x_t.ndim) * x_t
    )
    var = extract(sched.posterior_variance, t, x_t.ndim)
    log_var = extract(sched.posterior_log_variance_clipped, t, x_t.ndim)
    return mean, var, log_var


def p_step(
    sched: Schedule,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    eps_pred: jnp.ndarray,
    key: jax.Array,
    clip_x0: bool = True,
) -> jnp.ndarray:
    """One ancestral DDPM reverse step from ``x_t`` to ``x_{t-1}``.

    Noise is suppressed at t == 0 with ``jnp.where`` so the step stays
    branch-free inside ``lax.scan`` (SURVEY.md §7 "hard parts").
    """
    x0 = predict_x0_from_eps(sched, x_t, t, eps_pred)
    if clip_x0:
        x0 = jnp.clip(x0, -1.0, 1.0)
    mean, _, log_var = posterior_mean_variance(sched, x0, x_t, t)
    noise = jax.random.normal(key, x_t.shape, jnp.float32)
    nonzero = (t > 0).astype(jnp.float32)
    nonzero = jnp.reshape(nonzero, nonzero.shape + (1,) * (x_t.ndim - nonzero.ndim))
    out = mean + nonzero * jnp.exp(0.5 * log_var) * noise
    return out.astype(x_t.dtype)  # keep lax.scan carry dtype stable (bf16 path)


def mse_loss(eps_pred: jnp.ndarray, eps: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((eps_pred - eps) ** 2)
