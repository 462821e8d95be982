"""Scanned multi-step training dispatch == the per-step loop.

train/steps.py::make_{cnn,resdiff}_train_many exist purely to amortize the
axon relay's per-dispatch RPC overhead (PERF.md "Environment caveat"); the
contract is that a scanned run reproduces the historical per-step loop's
training trajectory bit-for-bit (same batch gathers, same per-step PRNG
keys).  These tests pin that contract on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrisr_tpu.train.state import create_train_state, make_optimizer


def _allclose_tree(a, b, **kw):
    flat_a, _ = jax.tree_util.tree_flatten(a)
    flat_b, _ = jax.tree_util.tree_flatten(b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), **kw)


def test_cnn_train_many_matches_loop():
    from mrisr_tpu.models.simple_cnn import SimpleCNN
    from mrisr_tpu.train.steps import make_cnn_train_many, make_cnn_train_step

    cnn = SimpleCNN(hidden=8)
    key = jax.random.PRNGKey(0)
    params = cnn.init(key, jnp.zeros((1, 16, 16, 1)))
    lr_all = jax.random.uniform(jax.random.PRNGKey(1), (12, 16, 16, 1))
    hr_all = jax.random.uniform(jax.random.PRNGKey(2), (12, 16, 16, 1))
    idx = np.stack(
        [np.random.default_rng(i).integers(0, 12, 4) for i in range(5)]
    )

    state_a = create_train_state(cnn.apply, params, make_optimizer(1e-3))
    step = make_cnn_train_step(cnn)
    losses_loop = []
    for i in range(5):
        b = {"lr": lr_all[idx[i]], "hr": hr_all[idx[i]]}
        state_a, m = step(state_a, b, jax.random.fold_in(key, i))
        losses_loop.append(float(m["loss"]))

    state_b = create_train_state(cnn.apply, params, make_optimizer(1e-3))
    many = make_cnn_train_many(cnn)
    state_b, losses = many(state_b, lr_all, hr_all, jnp.asarray(idx))

    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(losses_loop), rtol=1e-6
    )
    _allclose_tree(state_a.params, state_b.params, rtol=1e-6, atol=1e-7)


def test_resdiff_train_many_matches_loop():
    from mrisr_tpu.diffusion.schedules import resdiff_schedule
    from mrisr_tpu.models.resdiff_unet import ResDiffUNet
    from mrisr_tpu.train.steps import (
        make_resdiff_train_many,
        make_resdiff_train_step,
    )

    unet = ResDiffUNet(image_size=16, inner_channel=8, norm_groups=4)
    key = jax.random.PRNGKey(1)
    params = unet.init(key, jnp.zeros((1, 16, 16, 2)), jnp.array([0.5]))
    sched = resdiff_schedule(100)
    sr_all = jax.random.uniform(jax.random.PRNGKey(3), (10, 16, 16, 1))
    hr_all = jax.random.uniform(jax.random.PRNGKey(4), (10, 16, 16, 1))
    idx = np.stack(
        [np.random.default_rng(10_000 + i).integers(0, 10, 4) for i in range(4)]
    )

    state_a = create_train_state(
        unet.apply, params, make_optimizer(2e-4), ema_decay=0.99
    )
    step = make_resdiff_train_step(unet, sched)
    losses_loop = []
    for i in range(4):
        b = {"sr": sr_all[idx[i]], "hr": hr_all[idx[i]]}
        state_a, m = step(state_a, b, jax.random.fold_in(key, i))
        losses_loop.append(float(m["loss"]))

    state_b = create_train_state(
        unet.apply, params, make_optimizer(2e-4), ema_decay=0.99
    )
    many = make_resdiff_train_many(unet, sched)
    state_b, losses = many(
        state_b, sr_all, hr_all, jnp.asarray(idx), jnp.arange(4), key
    )

    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(losses_loop), rtol=1e-5
    )
    # scan vs loop compile to differently-fused fp32 programs; Adam's rsqrt
    # amplifies ulp-level grad differences (observed max 4e-6 abs on 1/9216
    # elements) — trajectory-identical, not bit-identical.
    _allclose_tree(state_a.params, state_b.params, rtol=1e-4, atol=1e-5)
    _allclose_tree(state_a.ema_params, state_b.ema_params, rtol=1e-4, atol=1e-5)
