import numpy as np
import jax.numpy as jnp

from mrisr_tpu.diffusion.schedules import (
    make_schedule,
    mnist_schedule,
    resdiff_schedule,
    sd15_schedule,
    rescale_zero_terminal_snr,
    spaced_timesteps,
    extract,
)


def test_mnist_schedule_matches_torch_reference():
    """Golden check vs the torch formulation in MNIST notebook cell 5."""
    import torch

    T = 1000
    betas_t = torch.linspace(1e-4, 0.02, T)
    ac_t = torch.cumprod(1 - betas_t, dim=0)
    sched = mnist_schedule(T)
    np.testing.assert_allclose(np.asarray(sched.betas), betas_t.numpy(), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_alphas_cumprod), torch.sqrt(ac_t).numpy(), rtol=1e-4
    )


def test_resdiff_schedule_range():
    sched = resdiff_schedule(1000)
    assert np.isclose(float(sched.betas[0]), 1e-6)
    assert np.isclose(float(sched.betas[-1]), 1e-2)
    # alphas_cumprod stays fairly high with this gentle schedule
    assert float(sched.alphas_cumprod[-1]) < 0.01


def test_zero_terminal_snr():
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
    rescaled = rescale_zero_terminal_snr(betas)
    ac = np.cumprod(1 - rescaled)
    assert ac[-1] < 1e-10  # terminal SNR is zero
    # first step preserved
    np.testing.assert_allclose(ac[0], 1 - betas[0], rtol=1e-6)
    sched = sd15_schedule(zero_terminal_snr=True)
    assert float(sched.alphas_cumprod[-1]) < 1e-6


def test_spaced_timesteps_trailing():
    ts = spaced_timesteps(1000, 50, "trailing")
    assert len(ts) == 50
    assert ts[0] == 999 and ts[-1] == 19
    assert np.all(np.diff(ts) == -20)


def test_spaced_timesteps_leading_linspace():
    lead = spaced_timesteps(1000, 50, "leading")
    assert lead[0] == 980 and lead[-1] == 0
    lin = spaced_timesteps(1000, 50, "linspace")
    assert lin[0] == 999 and lin[-1] == 0


def test_extract_broadcast():
    sched = mnist_schedule(10)
    t = jnp.array([0, 5, 9])
    out = extract(sched.betas, t, 4)
    assert out.shape == (3, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(out).ravel(), np.asarray(sched.betas)[[0, 5, 9]])


def test_posterior_coeffs_sum():
    """Posterior mean coefficients must interpolate exactly: c1 + c2*sqrt(ac_t)/? ...

    Check the DDPM identity: posterior_mean(x0=x, x_t=sqrt(ac_t) x) == x * m
    where m follows from the closed form; simplest strong check is that for
    x0 = x_t = 0 the mean is 0 and variance matches beta_tilde.
    """
    sched = make_schedule("linear", 100, 1e-4, 0.02)
    betas = np.asarray(sched.betas)
    ac = np.asarray(sched.alphas_cumprod)
    ac_prev = np.asarray(sched.alphas_cumprod_prev)
    expected_var = betas * (1 - ac_prev) / (1 - ac)
    np.testing.assert_allclose(
        np.asarray(sched.posterior_variance), expected_var, rtol=1e-3, atol=1e-8
    )
