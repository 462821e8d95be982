"""2D (data x model) mesh: TP-sharded params through a full train step.

The flagship ResDiff model trains pure-DP (SURVEY §7 — it is small); tensor
parallelism belongs to the wide SD1.5 latent UNet (320-1280 channels).
This pins that output-channel TP sharding compiles and executes under
GSPMD on the virtual 8-device mesh and does not change the numbers vs DP.

(The ResDiff UNet's FFT branch cannot join this test: the CPU backend's
FFT thunk rejects the non-major layouts GSPMD picks under a 2D mesh — a
virtual-mesh artifact, not a TPU limitation.)
"""
import jax
import jax.numpy as jnp
import numpy as np

from mrisr_tpu.models.sd_unet import SDUNet
from mrisr_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    make_mesh_2d,
    replicate_params,
    shard_params_tp,
)

TINY = dict(block_out_channels=(8, 16, 16, 16), heads=2, context_dim=16)


def _one_step(mesh, unet, params):
    @jax.jit
    def step(params, x_t, t, ctx, eps):
        def loss_fn(p):
            pred = unet.apply(p, x_t, t, ctx)
            return jnp.mean((pred - eps) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss, grads

    rng = np.random.default_rng(0)
    x_t = rng.normal(size=(8, 16, 16, 4)).astype(np.float32)
    eps = rng.normal(size=(8, 16, 16, 4)).astype(np.float32)
    ctx = rng.normal(size=(8, 7, 16)).astype(np.float32)
    t = np.arange(8, dtype=np.int32)
    sh4, sh3, sh1 = (batch_sharding(mesh, n) for n in (4, 3, 1))
    with mesh:
        loss, grads = step(
            params,
            jax.device_put(x_t, sh4),
            jax.device_put(t, sh1),
            jax.device_put(ctx, sh3),
            jax.device_put(eps, sh4),
        )
    return float(loss), grads


def test_2d_mesh_tp_step_matches_dp(key):
    unet = SDUNet(**TINY)
    params = unet.init(
        key, jnp.zeros((1, 16, 16, 4)), jnp.array([1]), jnp.zeros((1, 7, 16))
    )

    mesh_dp = make_mesh(8)
    loss_dp, g_dp = _one_step(mesh_dp, unet, replicate_params(mesh_dp, params))

    mesh_2d = make_mesh_2d(4, 2)
    sharded = shard_params_tp(mesh_2d, params, min_channels=16)
    # at least one kernel actually split over the model axis
    assert any(
        not x.sharding.is_fully_replicated
        for x in jax.tree_util.tree_leaves(sharded)
    )
    loss_2d, g_2d = _one_step(mesh_2d, unet, sharded)

    assert abs(loss_dp - loss_2d) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(g_dp), jax.tree_util.tree_leaves(g_2d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
