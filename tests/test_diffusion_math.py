import jax
import jax.numpy as jnp
import numpy as np

from mrisr_tpu.diffusion import ddpm, ddim, sr3, res_shift
from mrisr_tpu.diffusion.schedules import mnist_schedule, resdiff_schedule


SCHED = mnist_schedule(1000)


def test_q_sample_predict_x0_roundtrip(key):
    k1, k2 = jax.random.split(key)
    x0 = jax.random.normal(k1, (2, 1, 8, 8))
    eps = jax.random.normal(k2, (2, 1, 8, 8))
    t = jnp.array([100, 900])
    x_t = ddpm.q_sample(SCHED, x0, t, eps)
    x0_rec = ddpm.predict_x0_from_eps(SCHED, x_t, t, eps)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)
    eps_rec = ddpm.predict_eps_from_x0(SCHED, x_t, t, x0)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(eps), atol=1e-4)


def test_v_prediction_roundtrip(key):
    k1, k2 = jax.random.split(key)
    x0 = jax.random.normal(k1, (2, 1, 4, 4))
    eps = jax.random.normal(k2, (2, 1, 4, 4))
    t = jnp.array([10, 500])
    x_t = ddpm.q_sample(SCHED, x0, t, eps)
    v = ddpm.predict_v(SCHED, x0, t, eps)
    x0_rec = ddpm.predict_x0_from_v(SCHED, x_t, t, v)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)


def test_ddpm_step_t0_is_deterministic(key):
    """At t == 0 no noise is added; result equals posterior mean."""
    x0 = jnp.ones((1, 1, 4, 4)) * 0.5
    eps = jnp.zeros_like(x0)
    t = jnp.array([0])
    x_t = ddpm.q_sample(SCHED, x0, t, eps)
    out1 = ddpm.p_step(SCHED, x_t, t, eps, jax.random.PRNGKey(1))
    out2 = ddpm.p_step(SCHED, x_t, t, eps, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_ddim_one_shot_recovers_x0(key):
    """A single eta=0 DDIM step t -> -1 with the exact eps returns exactly x0."""
    k1, k2 = jax.random.split(key)
    x0 = jnp.clip(jax.random.normal(k1, (2, 1, 8, 8)) * 0.3, -1, 1)
    eps = jax.random.normal(k2, (2, 1, 8, 8))
    t = jnp.array([999, 999])
    x_t = ddpm.q_sample(SCHED, x0, t, eps)
    out = ddim.ddim_step(SCHED, x_t, t, jnp.array([-1, -1]), eps, clip_x0=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-3)


def test_ddim_deterministic(key):
    x_t = jax.random.normal(key, (1, 1, 8, 8))
    eps = jnp.zeros_like(x_t)
    a = ddim.ddim_step(SCHED, x_t, jnp.array([500]), jnp.array([480]), eps)
    b = ddim.ddim_step(SCHED, x_t, jnp.array([500]), jnp.array([480]), eps)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_sr3_gamma_bounds(key):
    sched = resdiff_schedule(1000)
    t = jnp.arange(0, 1000, 37)
    g = sr3.sample_gamma(sched, t, key)
    lo = jnp.sqrt(sched.alphas_cumprod[t])
    hi = jnp.sqrt(sched.alphas_cumprod_prev[t])
    assert bool(jnp.all(g >= lo - 1e-6)) and bool(jnp.all(g <= hi + 1e-6))


def test_sr3_qsample_roundtrip(key):
    k1, k2 = jax.random.split(key)
    x0 = jax.random.normal(k1, (3, 1, 8, 8))
    eps = jax.random.normal(k2, (3, 1, 8, 8))
    gamma = jnp.array([0.9, 0.5, 0.1])
    x_t = sr3.q_sample_gamma(x0, gamma, eps)
    x0_rec = sr3.predict_x0_from_eps_gamma(x_t, gamma, eps)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)


def test_res_shift_forward_reverse_consistency(key):
    """Reverse step with the exact eps reproduces the deterministic anchor path.

    Matches the math of src/adapters/res_srdiff.py:80-96.
    """
    sched = resdiff_schedule(1000)
    k1, k2, k3 = jax.random.split(key, 3)
    hr = jax.random.normal(k1, (1, 1, 8, 8)) * 0.5
    lr = hr + jax.random.normal(k2, (1, 1, 8, 8)) * 0.1
    eps = jax.random.normal(k3, (1, 1, 8, 8))
    t = jnp.array([800])
    x_t = res_shift.shift_forward(sched, hr, lr, t, eps)

    x0 = res_shift.predict_x0(sched, x_t, lr, t, eps)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(hr), atol=1e-3)

    # t_prev = 0 -> no posterior noise; deterministic re-anchor on LR
    out = res_shift.shift_reverse_step(
        sched, x_t, lr, t, jnp.array([0]), eps, jax.random.PRNGKey(7)
    )
    ac0 = float(sched.alphas_cumprod[0]) ** 0.5
    expected = ac0 * np.asarray(hr) + (1 - ac0) * np.asarray(lr)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-3)


def test_res_shift_terminal_state_is_lr_plus_noise(key):
    """As t -> T, x_t -> LR + noise (res_srdiff.py:16-17 comment)."""
    sched = resdiff_schedule(1000)
    hr = jnp.ones((1, 1, 4, 4))
    lr = -jnp.ones((1, 1, 4, 4))
    x_T = res_shift.shift_forward(sched, hr, lr, jnp.array([999]), jnp.zeros_like(hr))
    # sqrt(ac_999) is small -> mean close to LR
    assert float(jnp.abs(x_T - lr).max()) < 0.2
