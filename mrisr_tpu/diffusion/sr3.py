"""SR3/ResDiff continuous-noise-level diffusion formulation.

The reference's flagship ResDiff pipeline drives an SR3-style
``GaussianDiffusion`` living in the runtime-cloned LYL1015/ResDiff repo
(SURVEY.md §1 "vendored-at-runtime dependency"; call stack §3.3).  Its public
behaviour, re-derived here natively:

* Training conditions the denoiser on a *continuous* noise level
  ``gamma = sqrt(alpha_cumprod)`` sampled uniformly between consecutive
  schedule values, rather than an integer timestep:
  ``gamma ~ U(sqrt_ac_prev[t-1], sqrt_ac_prev[t])``, then
  ``x_t = gamma * x0 + sqrt(1 - gamma^2) * eps``.
* The denoiser input is ``concat([condition, x_t])`` on channels (the
  reference's patched UNet splits its input back in half —
  ``ResDif_execution.ipynb`` cell 9 ``torch.split(x, x.shape[1] // 2)``) and
  it receives ``gamma`` as the time input.
* In ResDiff the diffused signal is the *residual* ``HR - SimpleCNN(LR)`` and
  the condition is the CNN output, so sampling reconstructs
  ``SR = cnn_out + residual_sample`` (ResDiff paper semantics; the notebook
  wrapper feeds ``{'SR': cnn(lr), 'HR': hr}`` at cell 40).

The reverse chain reuses DDPM posterior math with integer timesteps; gamma at
inference is the tabulated ``sqrt_alphas_cumprod[t]``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mrisr_tpu.diffusion.schedules import Schedule


def sample_gamma(sched: Schedule, t: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Sample continuous sqrt-alpha-cumprod between schedule knots.

    ``t`` in [0, T); gamma ~ U(sqrt(ac_prev[t]), sqrt(ac[t])) where
    ``ac_prev[0] = 1`` — matching SR3's
    ``uniform(sqrt_alphas_cumprod_prev[t-1], sqrt_alphas_cumprod_prev[t])``.
    """
    hi = jnp.sqrt(sched.alphas_cumprod_prev[t])
    lo = jnp.sqrt(sched.alphas_cumprod[t])
    u = jax.random.uniform(key, jnp.shape(t))
    return lo + (hi - lo) * u


def q_sample_gamma(x0: jnp.ndarray, gamma: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """``x_t = gamma * x0 + sqrt(1 - gamma^2) * eps`` with gamma per-batch."""
    g = jnp.reshape(gamma, jnp.shape(gamma) + (1,) * (x0.ndim - jnp.ndim(gamma)))
    return g * x0 + jnp.sqrt(1.0 - g**2) * noise


def predict_x0_from_eps_gamma(x_t: jnp.ndarray, gamma: jnp.ndarray, eps: jnp.ndarray) -> jnp.ndarray:
    g = jnp.reshape(gamma, jnp.shape(gamma) + (1,) * (x_t.ndim - jnp.ndim(gamma)))
    return (x_t - jnp.sqrt(1.0 - g**2) * eps) / g
