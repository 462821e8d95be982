import jax
import jax.numpy as jnp
import numpy as np

from mrisr_tpu.diffusion.schedules import sd15_schedule
from mrisr_tpu.models.adapter import T2IAdapter
from mrisr_tpu.models.controlnet import ControlNet
from mrisr_tpu.models.lora import init_lora_params
from mrisr_tpu.models.sd_unet import SDUNet
from mrisr_tpu.models.vae import AutoencoderKL
from mrisr_tpu.train.latent import (
    make_adapter_train_step,
    make_controlnet_train_step,
    make_lora_train_step,
)
from mrisr_tpu.train.state import create_train_state, make_optimizer

TINY = dict(block_out_channels=(8, 16, 16, 16), heads=2, context_dim=16)


def _setup(key):
    unet = SDUNet(**TINY)
    vae = AutoencoderKL(block_out_channels=(8, 8, 16, 16))
    sched = sd15_schedule(zero_terminal_snr=False, timesteps=50)
    lat = jnp.zeros((1, 8, 8, 4))
    t = jnp.array([1])
    ctx = jnp.zeros((1, 7, 16))
    img = jnp.zeros((1, 64, 64, 3))
    k1, k2 = jax.random.split(key)
    unet_params = unet.init(k1, lat, t, ctx)
    vae_params = vae.init(k2, img)
    prompt = jnp.ones((1, 7, 16)) * 0.1
    batch = {
        "hr": jnp.ones((2, 64, 64, 1)) * 0.2,
        "lr": jnp.ones((2, 64, 64, 1)) * 0.1,
    }
    return unet, vae, sched, unet_params, vae_params, prompt, batch


def test_controlnet_train_step(key):
    unet, vae, sched, unet_params, vae_params, prompt, batch = _setup(key)
    cn = ControlNet(block_out_channels=TINY["block_out_channels"], heads=2, context_dim=16)
    cn_params = cn.init(
        key, jnp.zeros((1, 8, 8, 4)), jnp.array([1]), jnp.zeros((1, 7, 16)),
        jnp.zeros((1, 64, 64, 3)),
    )
    state = create_train_state(cn.apply, cn_params, make_optimizer(1e-4))
    step = make_controlnet_train_step(unet, cn, vae, sched, prompt)
    frozen = {"unet": unet_params, "vae": vae_params}
    state, m = step(state, frozen, batch, key)
    assert np.isfinite(float(m["loss"]))
    # params actually moved
    before = jax.tree_util.tree_leaves(cn_params)
    after = jax.tree_util.tree_leaves(state.params)
    assert any(float(jnp.abs(a - b).max()) > 0 for a, b in zip(after, before))


def test_lora_train_step(key):
    unet, vae, sched, unet_params, vae_params, prompt, batch = _setup(key)
    lora = init_lora_params(key, unet_params, rank=2)
    state = create_train_state(None, lora, make_optimizer(1e-3))
    step = make_lora_train_step(unet, vae, sched, prompt, unet_params)
    frozen = {"vae": vae_params}
    losses = []
    for i in range(3):
        state, m = step(state, frozen, batch, jax.random.fold_in(key, i))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)


def test_adapter_train_step(key):
    unet, vae, sched, unet_params, vae_params, prompt, batch = _setup(key)
    ad = T2IAdapter(channels=TINY["block_out_channels"])
    ad_params = ad.init(key, jnp.zeros((1, 64, 64, 3)))
    state = create_train_state(ad.apply, ad_params, make_optimizer(1e-4))
    step = make_adapter_train_step(unet, ad, vae, sched, prompt)
    frozen = {"unet": unet_params, "vae": vae_params}
    state, m = step(state, frozen, batch, key)
    assert np.isfinite(float(m["loss"]))
