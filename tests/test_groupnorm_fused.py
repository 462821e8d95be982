"""Fused GroupNorm+SiLU: kernel vs flax composition, gradients, integration."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from mrisr_tpu.ops.groupnorm import (
    _gn_silu_forward,
    fused_group_norm_silu,
    group_norm_silu_reference,
)


@pytest.mark.parametrize("shape,groups", [((2, 8, 8, 16), 4), ((1, 16, 16, 32), 16)])
def test_kernel_matches_flax_groupnorm_swish(key, shape, groups):
    x = jax.random.normal(key, shape)
    gn = nn.GroupNorm(num_groups=groups)
    p = gn.init(key, x)
    want = nn.swish(gn.apply(p, x))
    scale, bias = p["params"]["scale"], p["params"]["bias"]

    ref = group_norm_silu_reference(x, scale, bias, groups, eps=1e-6)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(want), atol=2e-6)

    kern = _gn_silu_forward(x, scale, bias, groups, 1e-6, interpret=True)
    np.testing.assert_allclose(np.asarray(kern), np.asarray(want), atol=2e-5)


def test_fused_gradients_match_composition(key):
    x = jax.random.normal(key, (2, 8, 8, 8))
    scale = jnp.ones(8) * 1.3
    bias = jnp.zeros(8) + 0.1

    def loss_fused(x_, s_, b_):
        return jnp.sum(fused_group_norm_silu(x_, s_, b_, 4, 1e-6) ** 2)

    def loss_ref(x_, s_, b_):
        return jnp.sum(group_norm_silu_reference(x_, s_, b_, 4, 1e-6) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sgroupnorm_fuse_silu_matches_composition(key):
    """SGroupNorm(fuse_silu=True) == SGroupNorm + swish on s2d tensors.

    The c-major s2d order makes plain group g a contiguous lane range, so
    the plain-layout fused op applies verbatim (models/layers.py).  On CPU
    this exercises the exact lax fallback; the interpret-mode kernel check
    covers the Pallas path at the same s2d shape."""
    from mrisr_tpu.models.layers import SGroupNorm, tile4_vec
    from mrisr_tpu.ops.groupnorm import _gn_silu_forward

    x = jax.random.normal(key, (2, 8, 8, 32), jnp.float32)  # s2d of C=8
    gn = SGroupNorm(4)
    p = gn.init(key, x)
    p = jax.tree_util.tree_map(
        lambda a: jax.random.normal(key, a.shape) * 0.3 + 1.0, p
    )
    want = nn.swish(gn.apply(p, x))
    got = gn.apply(p, x, fuse_silu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)

    scale, bias = p["params"]["scale"], p["params"]["bias"]
    kern = _gn_silu_forward(
        x, tile4_vec(scale), tile4_vec(bias), 4, 1e-5, interpret=True
    )
    np.testing.assert_allclose(np.asarray(kern), np.asarray(want), atol=2e-5)


def test_convblock_s2d_fused_gate_is_exact(key, monkeypatch):
    """ConvBlock s2d output is identical with the fused-GN gate on and off
    (CPU: composition fallback; the kernel itself is covered above)."""
    from mrisr_tpu.models import layers

    x = jax.random.normal(key, (1, 8, 8, 32))
    blk = layers.ConvBlock(8, groups=4, s2d=True)
    params = blk.init(key, x)
    monkeypatch.setattr(layers, "S2D_FUSED_GN", False)
    off = blk.apply(params, x)
    monkeypatch.setattr(layers, "S2D_FUSED_GN", True)
    on = blk.apply(params, x)
    np.testing.assert_allclose(np.asarray(on), np.asarray(off), atol=2e-6)


def test_convblock_matches_fused_reference(key):
    """ConvBlock's GN+swish equals the fused op's reference composition
    (the kernel is a drop-in if its VMEM economics ever work out)."""
    from mrisr_tpu.models.layers import ConvBlock

    blk = ConvBlock(8, groups=4)
    x = jax.random.normal(key, (1, 8, 8, 8))
    params = blk.init(key, x)
    gn = params["params"]["GroupNorm_0"]
    want = group_norm_silu_reference(x, gn["scale"], gn["bias"], 4, eps=1e-6)
    h = nn.swish(nn.GroupNorm(num_groups=4).apply({"params": gn}, x))
    np.testing.assert_allclose(np.asarray(h), np.asarray(want), atol=2e-6)
