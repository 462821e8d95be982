"""Fused (vmapped) ControlNet+UNet encoder towers == unfused reference.

The fused path (models/fused.py) reorganizes the per-step computation of
``pipelines/latent.py::eps_fn`` — UNet and ControlNet down+mid towers as one
program over a stacked weight axis — without changing the math.  These tests
pin exact equivalence at the whole-pipeline level (VAE encode -> K fused
steps -> decode) and the config guard.

Reference dataflow being preserved: diffusers ControlNet residual hookups
(``src/adapters/res_srdiff.py:63-78``) — residuals join additively after the
UNet down tower / mid block, never inside them.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrisr_tpu.diffusion.schedules import sd15_schedule
from mrisr_tpu.models.controlnet import ControlNet
from mrisr_tpu.models.sd_unet import SDUNet
from mrisr_tpu.models.vae import AutoencoderKL
from mrisr_tpu.pipelines.latent import LatentSRPipeline


def _tiny_stack(res=64):  # latent 8x8: smallest f=8 grid that survives 3 downsamples
    unet = SDUNet(block_out_channels=(8, 16, 16, 16), heads=2, context_dim=16)
    cn = ControlNet(block_out_channels=(8, 16, 16, 16), heads=2, context_dim=16)
    vae = AutoencoderKL(block_out_channels=(8, 8, 16, 16))
    f = res // 8
    lat = jnp.zeros((1, f, f, 4))
    t = jnp.array([1])
    ctx = jnp.zeros((1, 7, 16))
    img3 = jnp.zeros((1, res, res, 3))
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    # Non-zero-init everything (incl. the zero convs) so the fused residual
    # join is actually exercised, not hidden behind zeros.
    up = unet.init(k1, lat, t, ctx)
    cp = cn.init(k2, lat, t, ctx, img3)
    cp = jax.tree_util.tree_map(
        lambda a: a + 0.01 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape) / a.size,
        cp,
    )
    vp = vae.init(k3, img3)
    prompt = jax.random.normal(jax.random.PRNGKey(9), (1, 7, 16))
    return unet, cn, vae, up, cp, vp, prompt, res


def test_fused_pipeline_matches_unfused():
    unet, cn, vae, up, cp, vp, prompt, res = _tiny_stack()
    sched = sd15_schedule()
    common = (unet, cn, vae, sched, up, cp, vp, prompt)
    pipe_ref = LatentSRPipeline(*common, precompute_cond=True, fused_towers=False)
    pipe_fused = LatentSRPipeline(*common, precompute_cond=True, fused_towers=True)

    lr = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, res, res, 1)), jnp.float32
    )
    key = jax.random.PRNGKey(11)
    out_ref = np.asarray(pipe_ref.super_resolve(lr, key, num_inference_steps=3))
    out_fused = np.asarray(pipe_fused.super_resolve(lr, key, num_inference_steps=3))
    # Same ops modulo vmap batching; fp32 tolerance covers lowering
    # differences (grouped-conv vs per-lane conv reassociation).
    np.testing.assert_allclose(out_fused, out_ref, atol=2e-4, rtol=2e-4)


def test_fused_requires_matching_configs():
    unet = SDUNet(block_out_channels=(8, 16, 16, 16), heads=2, context_dim=16)
    cn = ControlNet(block_out_channels=(8, 16, 32, 32), heads=2, context_dim=16)
    vae = AutoencoderKL(block_out_channels=(8, 8, 16, 16))
    with pytest.raises(ValueError, match="fused towers"):
        LatentSRPipeline(
            unet, cn, vae, sd15_schedule(), None, None, None,
            jnp.zeros((1, 7, 16)), fused_towers=True,
        )


def test_fused_program_identity_and_auto_default():
    """fused on/off are distinct jit program keys (no silent cache mix);
    the default (None) auto-resolves to fused for matching configs and to
    sequential for mismatched ones."""
    unet, cn, vae, up, cp, vp, prompt, _ = _tiny_stack()
    sched = sd15_schedule()
    auto = LatentSRPipeline(unet, cn, vae, sched, up, cp, vp, prompt)
    off = LatentSRPipeline(unet, cn, vae, sched, up, cp, vp, prompt, fused_towers=False)
    on = LatentSRPipeline(unet, cn, vae, sched, up, cp, vp, prompt, fused_towers=True)
    assert auto.fused_towers is True  # matching configs -> fused by default
    assert auto == on and hash(auto) == hash(on)
    assert auto != off and hash(auto) != hash(off)

    # mismatched configs: auto falls back to sequential instead of raising
    cn_mismatch = ControlNet(block_out_channels=(8, 16, 32, 32), heads=2, context_dim=16)
    auto_seq = LatentSRPipeline(
        unet, cn_mismatch, vae, sched, up, cp, vp, prompt
    )
    assert auto_seq.fused_towers is False
