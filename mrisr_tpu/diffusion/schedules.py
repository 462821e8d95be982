"""Diffusion noise schedules.

Covers every schedule the reference stack uses (SURVEY.md §2/§7):

* MNIST-style DDPM: ``linear_betas(1e-4, 0.02, 1000)``
  (reference ``notebooks/MNIST_Super_Resolution.ipynb`` cell 5).
* ResDiff/SR3-style: ``linear_betas(1e-6, 1e-2, 1000)``
  (reference ``notebooks/ResDif_execution.ipynb`` cell 37 beta_schedule).
* SD1.5 latent path: ``scaled_linear_betas(0.00085, 0.012, 1000)`` with
  optional zero-terminal-SNR rescale and "trailing" inference-timestep
  spacing (reference config cell 11: ``ddpm_scheduler_timestep_spacing:
  "trailing"``, ``ddpm_scheduler_rescale_betas_zero_snr: True``).

Everything is precomputed as plain ``jnp`` arrays inside a pytree dataclass so
schedules flow through ``jax.jit`` / ``lax.scan`` without retracing.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Schedule:
    """Precomputed diffusion schedule quantities, all shape ``[T]``."""

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray  # shifted; alphas_cumprod_prev[0] == 1
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray  # coefficient of x0
    posterior_mean_coef2: jnp.ndarray  # coefficient of x_t

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def linear_betas(start: float, end: float, timesteps: int) -> np.ndarray:
    """Plain linear beta ramp (MNIST cell 5 / SR3 'linear' schedule)."""
    return np.linspace(start, end, timesteps, dtype=np.float64)


def scaled_linear_betas(start: float, end: float, timesteps: int) -> np.ndarray:
    """Diffusers 'scaled_linear' (Stable Diffusion): linear in sqrt-beta."""
    return np.linspace(start**0.5, end**0.5, timesteps, dtype=np.float64) ** 2


def cosine_betas(timesteps: int, s: float = 0.008, max_beta: float = 0.999) -> np.ndarray:
    """Nichol & Dhariwal squared-cosine schedule (diffusers 'squaredcos_cap_v2')."""

    def bar(t):
        return math.cos((t + s) / (1 + s) * math.pi / 2) ** 2

    betas = []
    for i in range(timesteps):
        t1 = i / timesteps
        t2 = (i + 1) / timesteps
        betas.append(min(1 - bar(t2) / bar(t1), max_beta))
    return np.asarray(betas, dtype=np.float64)


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Rescale betas so the terminal SNR is exactly zero.

    Implements the fix from "Common Diffusion Noise Schedules and Sample Steps
    are Flawed" (Lin et al. 2023), matching diffusers'
    ``rescale_betas_zero_snr`` used by the reference config
    (``ResDif_execution.ipynb`` cell 11).  Operates on sqrt(alphas_cumprod):
    shift so the last value is 0 and scale so the first is preserved.
    """
    betas = np.asarray(betas, dtype=np.float64)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    sqrt_ac = np.sqrt(alphas_cumprod)

    sqrt_ac_0 = sqrt_ac[0]
    sqrt_ac_T = sqrt_ac[-1]
    sqrt_ac = sqrt_ac - sqrt_ac_T
    sqrt_ac = sqrt_ac * sqrt_ac_0 / (sqrt_ac_0 - sqrt_ac_T)

    alphas_cumprod = sqrt_ac**2
    alphas = np.empty_like(alphas_cumprod)
    alphas[0] = alphas_cumprod[0]
    alphas[1:] = alphas_cumprod[1:] / alphas_cumprod[:-1]
    return 1.0 - alphas


def make_schedule(
    kind: str = "linear",
    timesteps: int = 1000,
    beta_start: float = 1e-4,
    beta_end: float = 0.02,
    zero_terminal_snr: bool = False,
    dtype=jnp.float32,
) -> Schedule:
    """Build a :class:`Schedule` from a named beta ramp."""
    if kind == "linear":
        betas = linear_betas(beta_start, beta_end, timesteps)
    elif kind == "scaled_linear":
        betas = scaled_linear_betas(beta_start, beta_end, timesteps)
    elif kind in ("cosine", "squaredcos_cap_v2"):
        betas = cosine_betas(timesteps)
    else:
        raise ValueError(f"unknown schedule kind: {kind!r}")

    if zero_terminal_snr:
        betas = rescale_zero_terminal_snr(betas)

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    # log-variance clipped at t=0 (variance is 0 there) following DDPM practice.
    posterior_log_variance_clipped = np.log(
        np.maximum(posterior_variance, posterior_variance[1] if timesteps > 1 else 1e-20)
    )
    posterior_mean_coef1 = betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_mean_coef2 = (
        (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
    )

    as_dtype = lambda a: jnp.asarray(a, dtype=dtype)
    return Schedule(
        betas=as_dtype(betas),
        alphas=as_dtype(alphas),
        alphas_cumprod=as_dtype(alphas_cumprod),
        alphas_cumprod_prev=as_dtype(alphas_cumprod_prev),
        sqrt_alphas_cumprod=as_dtype(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=as_dtype(np.sqrt(1.0 - alphas_cumprod)),
        posterior_variance=as_dtype(posterior_variance),
        posterior_log_variance_clipped=as_dtype(posterior_log_variance_clipped),
        posterior_mean_coef1=as_dtype(posterior_mean_coef1),
        posterior_mean_coef2=as_dtype(posterior_mean_coef2),
    )


def mnist_schedule(timesteps: int = 1000) -> Schedule:
    """MNIST notebook schedule: linspace(1e-4, 0.02) (reference cell 5)."""
    return make_schedule("linear", timesteps, 1e-4, 0.02)


def resdiff_schedule(timesteps: int = 1000) -> Schedule:
    """ResDiff/SR3 schedule: linear 1e-6 -> 1e-2 (reference cell 37)."""
    return make_schedule("linear", timesteps, 1e-6, 1e-2)


def sd15_schedule(zero_terminal_snr: bool = True, timesteps: int = 1000) -> Schedule:
    """SD1.5 schedule with the reference's zero-SNR rescale (cell 11)."""
    return make_schedule(
        "scaled_linear", timesteps, 0.00085, 0.012, zero_terminal_snr=zero_terminal_snr
    )


def spaced_timesteps(
    train_timesteps: int, num_inference_steps: int, spacing: str = "trailing"
) -> np.ndarray:
    """Inference timestep subsequence, descending, diffusers semantics.

    ``spacing`` follows diffusers ``DDPMScheduler.set_timesteps``:

    * ``"leading"``: ``arange(n) * (T // n)``, reversed.
    * ``"trailing"``: ``round(arange(T, 0, -T/n)) - 1`` (reference config
      cell 11 uses this).
    * ``"linspace"``: ``linspace(0, T-1, n)`` rounded, reversed.
    """
    T, n = train_timesteps, num_inference_steps
    if n > T:
        raise ValueError(f"num_inference_steps {n} > train timesteps {T}")
    if spacing == "leading":
        step = T // n
        ts = (np.arange(n) * step).round()[::-1].astype(np.int64)
    elif spacing == "trailing":
        ts = np.round(np.arange(T, 0, -T / n)).astype(np.int64) - 1
    elif spacing == "linspace":
        ts = np.linspace(0, T - 1, n).round()[::-1].astype(np.int64)
    else:
        raise ValueError(f"unknown timestep spacing: {spacing!r}")
    return ts


def extract(a: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep scalars ``a[t]`` and broadcast to ``ndim`` dims.

    ``t`` may be a scalar or ``[B]``; the result has shape ``[B, 1, ..., 1]``
    suitable for broadcasting against ``[B, H, W, C]`` (or any layout).
    """
    out = a[t]
    out = jnp.reshape(out, out.shape + (1,) * (ndim - out.ndim))
    return out
