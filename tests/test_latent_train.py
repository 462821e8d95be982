import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrisr_tpu.diffusion.schedules import sd15_schedule
from mrisr_tpu.models.adapter import T2IAdapter
from mrisr_tpu.models.controlnet import ControlNet
from mrisr_tpu.models.lora import init_lora_params
from mrisr_tpu.models.sd_unet import SDUNet
from mrisr_tpu.models.vae import AutoencoderKL
from mrisr_tpu.train.latent import (
    make_adapter_train_step,
    make_controlnet_train_step,
    make_latent_base_train_step,
    make_lora_train_step,
    make_vae_train_step,
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


def test_vae_train_step_reduces_loss(key):
    """A few steps of AutoencoderKL training on a fixed batch must reduce
    the reconstruction loss (the optimizer actually optimizes)."""
    vae = AutoencoderKL(block_out_channels=(8, 8, 16))
    img = jnp.zeros((1, 32, 32, 3))
    params = vae.init(key, img)
    state = create_train_state(vae.apply, params, make_optimizer(1e-3))
    step = make_vae_train_step(vae)
    rng = np.random.default_rng(0)
    batch = {"img": jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32))}
    losses = []
    for i in range(8):
        state, m = step(state, batch, jax.random.fold_in(key, i))
        losses.append(float(m["rec"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_latent_base_train_step(key):
    """Base-UNet training step (gradients to the UNet itself): finite loss
    and the UNet params move while the frozen VAE stays untouched."""
    unet, vae, sched, unet_params, vae_params, prompt, batch = _setup(key)
    state = create_train_state(unet.apply, unet_params, make_optimizer(1e-4))
    step = make_latent_base_train_step(unet, vae, sched, prompt)
    state, m = step(state, {"vae": vae_params}, batch, key)
    assert np.isfinite(float(m["loss"]))
    before = jax.tree_util.tree_leaves(unet_params)
    after = jax.tree_util.tree_leaves(state.params)
    assert any(float(jnp.abs(a - b).max()) > 0 for a, b in zip(after, before))


@pytest.mark.slow
def test_run_phantom_latent_smoke():
    """End-to-end structure of the phantom latent parity leg at toy scale:
    all rows present, finite, with paired-delta stats (eval/parity.py::
    run_phantom_latent; reference src/adapters/res_srdiff.py:36-105).  Not
    a fidelity claim — that's the PARITY_r08 artifact's job."""
    from mrisr_tpu.eval.parity import run_phantom_latent

    rep = run_phantom_latent(
        res=32, n_train=8, n_test=2, batch=2, vae_steps=2, base_steps=2,
        cn_steps=2, lora_steps=2, num_inference_steps=2, sample_seeds=(2,),
    )
    for row in ("base_unet", "controlnet", "lora"):
        assert np.isfinite(rep[row]["mean"]["psnr"])
        assert len(rep[row]["per_image"]["psnr"]) == 2
        assert "delta_vs_bicubic_psnr" in rep[row]
        assert isinstance(rep[row]["beats_bicubic"], bool)
    assert np.isfinite(rep["vae_recon_ceiling"]["psnr"])
    assert np.isfinite(rep["bicubic_baseline"]["psnr"])
    assert rep["config"]["vae"]["f"] == 4


def test_adapter_train_step(key):
    unet, vae, sched, unet_params, vae_params, prompt, batch = _setup(key)
    ad = T2IAdapter(channels=TINY["block_out_channels"])
    ad_params = ad.init(key, jnp.zeros((1, 64, 64, 3)))
    state = create_train_state(ad.apply, ad_params, make_optimizer(1e-4))
    step = make_adapter_train_step(unet, ad, vae, sched, prompt)
    frozen = {"unet": unet_params, "vae": vae_params}
    state, m = step(state, frozen, batch, key)
    assert np.isfinite(float(m["loss"]))


def test_adapter_train_step_feature_parity(key):
    """VERDICT round-4 weak #4: the adapter factory must support
    prediction_type, CFG dropout, and the many-wrapper signature like its
    siblings."""
    from mrisr_tpu.train.latent import make_latent_train_many

    unet, vae, sched, unet_params, vae_params, prompt, batch = _setup(key)
    ad = T2IAdapter(channels=TINY["block_out_channels"])
    ad_params = ad.init(key, jnp.zeros((1, 64, 64, 3)))
    frozen = {"unet": unet_params, "vae": vae_params}

    # prediction_type changes the regression target -> different loss.
    losses = {}
    for pt in ("epsilon", "sample"):
        step = make_adapter_train_step(
            unet, ad, vae, sched, prompt, prediction_type=pt
        )
        st = create_train_state(ad.apply, ad_params, make_optimizer(1e-4))
        _, m = step(st, frozen, batch, key)
        losses[pt] = float(m["loss"])
    assert np.isfinite(losses["epsilon"]) and np.isfinite(losses["sample"])
    assert losses["epsilon"] != losses["sample"]

    # CFG dropout with p=1.0 replaces every context row with the empty
    # embedding: identical to training directly on that embedding (the two
    # steps derive the same 4-way key split, so all randomness pairs up).
    empty = jnp.ones((1, 7, 16)) * 0.7
    step_dropped = make_adapter_train_step(
        unet, ad, vae, sched, prompt, empty_embeds=empty,
        proportion_empty_prompts=1.0,
    )
    step_on_empty = make_adapter_train_step(
        unet, ad, vae, sched, empty, proportion_empty_prompts=0.0
    )
    st = create_train_state(ad.apply, ad_params, make_optimizer(1e-4))
    _, m1 = step_dropped(st, frozen, batch, key)
    _, m2 = step_on_empty(st, frozen, batch, key)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)

    # many-wrapper compatibility (the scanned chunked-TPU dispatch).
    step = make_adapter_train_step(unet, ad, vae, sched, prompt)
    many = make_latent_train_many(step)
    st = create_train_state(ad.apply, ad_params, make_optimizer(1e-4))
    lr_all = jnp.concatenate([batch["lr"]] * 2)
    hr_all = jnp.concatenate([batch["hr"]] * 2)
    idx = jnp.asarray([[0, 1], [2, 3]])
    st, ls = many(st, frozen, lr_all, hr_all, idx, jnp.asarray([0, 1]), key)
    assert ls.shape == (2,) and np.isfinite(np.asarray(ls)).all()


def test_adapter_zero_out_untrained_is_base(key):
    """T2IAdapter(zero_out=True) at init emits all-zero features, so the
    UNet forward with an untrained adapter equals the bare base forward —
    the from-identity property the trained-evidence leg needs
    (models/adapter.py; mirrors the ControlNet zero-conv convention)."""
    unet, vae, sched, unet_params, vae_params, prompt, batch = _setup(key)
    ad = T2IAdapter(channels=TINY["block_out_channels"], zero_out=True)
    ad_params = ad.init(key, jnp.zeros((1, 64, 64, 3)))
    cond = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64, 64, 3)), jnp.float32
    )
    feats = ad.apply(ad_params, cond)
    assert len(feats) == 4
    assert all(float(jnp.abs(f).max()) == 0.0 for f in feats)

    lat = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 8, 8, 4)), jnp.float32
    )
    t = jnp.array([3, 7])
    ctx = jnp.ones((2, 7, 16)) * 0.1
    out_base = unet.apply(unet_params, lat, t, ctx)
    out_ad = unet.apply(unet_params, lat, t, ctx, adapter_features=feats)
    np.testing.assert_allclose(np.asarray(out_ad), np.asarray(out_base), atol=0)


def test_latent_pipeline_adapter_mode(key):
    """LatentSRPipeline adapter serving mode: end-to-end chain runs, and
    with a zero_out untrained adapter it matches the ControlNet pipeline
    at zero-init CN params (both are exactly the base UNet chain)."""
    from mrisr_tpu.pipelines.latent import LatentSRPipeline

    unet, vae, sched, unet_params, vae_params, prompt, batch = _setup(key)
    ad = T2IAdapter(channels=TINY["block_out_channels"], zero_out=True)
    ad_params = ad.init(key, jnp.zeros((1, 64, 64, 3)))
    cn = ControlNet(
        block_out_channels=TINY["block_out_channels"], heads=2, context_dim=16
    )
    cn_params = cn.init(
        key, jnp.zeros((1, 8, 8, 4)), jnp.array([1]), jnp.zeros((1, 7, 16)),
        jnp.zeros((1, 64, 64, 3)),
    )
    pipe_ad = LatentSRPipeline(
        unet, None, vae, sched, unet_params, ad_params, vae_params, prompt,
        adapter=ad,
    )
    # Sequential CN program: the fused stacked-tower lowering differs at the
    # ~1e-6/step level and a 3-step chain + VAE decode amplifies that to
    # ~3e-4 (measured) — the adapter chain matches the SEQUENTIAL program
    # (the same XLA structure) to ~1e-5.
    pipe_cn = LatentSRPipeline(
        unet, cn, vae, sched, unet_params, cn_params, vae_params, prompt,
        fused_towers=False,
    )
    lr = jnp.asarray(
        np.random.default_rng(2).uniform(-1, 1, (2, 64, 64, 1)), jnp.float32
    )
    out_ad = np.asarray(pipe_ad.super_resolve(lr, key, num_inference_steps=3))
    assert out_ad.shape == (2, 64, 64, 3) and np.isfinite(out_ad).all()
    out_cn = np.asarray(pipe_cn.super_resolve(lr, key, num_inference_steps=3))
    np.testing.assert_allclose(out_ad, out_cn, atol=1e-4, rtol=1e-4)


def test_cn_lora_train_step(key):
    """Combined ControlNet+LoRA step: both subtrees get gradients, and the
    fused stacked-tower program matches the sequential one."""
    import optax

    from mrisr_tpu.train.latent import make_cn_lora_train_step

    unet, vae, sched, unet_params, vae_params, prompt, batch = _setup(key)
    cn = ControlNet(
        block_out_channels=TINY["block_out_channels"], heads=2, context_dim=16
    )
    cn_params = cn.init(
        key, jnp.zeros((1, 8, 8, 4)), jnp.array([1]), jnp.zeros((1, 7, 16)),
        jnp.zeros((1, 64, 64, 3)),
    )
    # Perturb zero-init convs + LoRA B so every lane contributes gradients.
    cn_params = jax.tree_util.tree_map(
        lambda a: a + 0.01 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape) / a.size,
        cn_params,
    )
    lora = init_lora_params(key, unet_params, rank=2)
    lora = jax.tree_util.tree_map(lambda a: a + 0.01, lora)
    p0 = {"cn": cn_params, "lora": lora}
    frozen = {"vae": vae_params}
    results = {}
    for fused in (False, True):
        step = make_cn_lora_train_step(
            unet, cn, vae, sched, prompt, unet_params, fused=fused
        )
        state = create_train_state(None, p0, optax.sgd(1e-2))
        state, m = step(state, frozen, batch, key)
        results[fused] = (float(m["loss"]), state.params)
    loss, params = results[False]
    assert np.isfinite(loss)
    moved = lambda new, old: any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(
            jax.tree_util.tree_leaves(new), jax.tree_util.tree_leaves(old)
        )
    )
    assert moved(params["cn"], cn_params)
    assert moved(params["lora"], lora)
    np.testing.assert_allclose(results[True][0], results[False][0], rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(results[True][1]),
        jax.tree_util.tree_leaves(results[False][1]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_cached_latents_match_pixel_path(key):
    """latents_cached=True (posterior moments precomputed, sampled in-step
    with AutoencoderKL.encode's exact formula) must reproduce the pixel
    path's loss at the same key — the warrant for the 256^2 harness's
    latent cache (eval/parity.py::run_phantom_latent cache_latents)."""
    unet, vae, sched, unet_params, vae_params, prompt, batch = _setup(key)
    mean_hr, logvar_hr = vae.apply(
        vae_params, jnp.repeat(batch["hr"], 3, axis=-1), method=vae.encode_moments
    )
    mean_lr, logvar_lr = vae.apply(
        vae_params, jnp.repeat(batch["lr"], 3, axis=-1), method=vae.encode_moments
    )
    cached_batch = {
        "hr_mean": mean_hr, "hr_logvar": logvar_hr,
        "lr_mean": mean_lr, "lr_logvar": logvar_lr,
        "lr": batch["lr"],
    }
    for factory, kwargs in (
        (make_latent_base_train_step, {}),
        (make_lora_train_step, {"base_unet_params": unet_params}),
    ):
        if factory is make_lora_train_step:
            params = init_lora_params(key, unet_params, rank=2)
            mk = lambda cached: factory(
                unet, vae, sched, prompt, unet_params, latents_cached=cached
            )
        else:
            params = unet_params
            mk = lambda cached: factory(
                unet, vae, sched, prompt, latents_cached=cached
            )
        import optax

        losses = {}
        for cached in (False, True):
            st = create_train_state(None, params, optax.sgd(1e-2))
            _, m = mk(cached)(
                st, {"vae": vae_params},
                cached_batch if cached else batch, key,
            )
            losses[cached] = float(m["loss"])
        np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)


def test_latent_train_many_matches_loop(key):
    """Scanned K-step dispatch (make_latent_train_many) reproduces the
    per-step loop's trajectory exactly (same gather + fold_in walk — the
    chunked-TPU contract run_phantom_latent(chunk_steps=...) relies on)."""
    from mrisr_tpu.train.latent import make_latent_train_many

    # Smaller than _setup (f=4 VAE, 32^2 images -> 8^2 latents): the scan
    # compiles the whole K-step program, so keep it cheap on one core.
    unet = SDUNet(**TINY)
    vae = AutoencoderKL(block_out_channels=(8, 8, 16))
    sched = sd15_schedule(zero_terminal_snr=False, timesteps=50)
    k1, k2 = jax.random.split(key)
    unet_params = unet.init(k1, jnp.zeros((1, 8, 8, 4)), jnp.array([1]), jnp.zeros((1, 7, 16)))
    vae_params = vae.init(k2, jnp.zeros((1, 32, 32, 3)))
    prompt = jnp.ones((1, 7, 16)) * 0.1
    lr_all = jnp.asarray(np.random.default_rng(0).standard_normal((6, 32, 32, 1)), jnp.float32)
    hr_all = jnp.asarray(np.random.default_rng(1).standard_normal((6, 32, 32, 1)), jnp.float32)
    step = make_latent_base_train_step(unet, vae, sched, prompt)
    frozen = {"vae": vae_params}
    K, B = 3, 2
    idx = np.stack([np.random.default_rng(100 + i).integers(0, 6, B) for i in range(K)])
    ids = np.arange(100, 100 + K)

    # SGD, not Adam: the scanned program's XLA lowering differs from the
    # loop's at the 1e-6 level (fusion reassociation), and Adam's
    # eps-normalized updates amplify that to O(1) RELATIVE differences on
    # zero-init leaves whose true gradient is ~0.  SGD keeps the noise
    # proportional, while a wrong key/idx walk still diverges at O(grad).
    import optax
    st_loop = create_train_state(unet.apply, unet_params, optax.sgd(1e-2))
    losses_loop = []
    for i in range(K):
        b = {"lr": lr_all[idx[i]], "hr": hr_all[idx[i]]}
        st_loop, m = step(st_loop, frozen, b, jax.random.fold_in(key, int(ids[i])))
        losses_loop.append(float(m["loss"]))

    st_scan = create_train_state(unet.apply, unet_params, optax.sgd(1e-2))
    many = make_latent_train_many(step)
    st_scan, losses = many(
        st_scan, frozen, lr_all, hr_all, jnp.asarray(idx), jnp.asarray(ids), key
    )
    assert losses.shape == (K,)
    np.testing.assert_allclose(np.asarray(losses), losses_loop, rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(st_loop.params),
        jax.tree_util.tree_leaves(st_scan.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_vae_train_many_matches_loop(key):
    from mrisr_tpu.train.latent import make_vae_train_many

    vae = AutoencoderKL(block_out_channels=(8, 8, 16))
    vae_params = vae.init(key, jnp.zeros((1, 32, 32, 3)))
    pool = jnp.asarray(np.random.default_rng(2).standard_normal((5, 32, 32, 3)), jnp.float32)
    step = make_vae_train_step(vae)
    K, B = 3, 2
    idx = np.stack([np.random.default_rng(i).integers(0, 5, B) for i in range(K)])
    ids = np.arange(K)

    import optax
    st_loop = create_train_state(vae.apply, vae_params, optax.sgd(1e-2))  # SGD: see above
    rec_loop = []
    for i in range(K):
        st_loop, m = step(st_loop, {"img": pool[idx[i]]}, jax.random.fold_in(key, i))
        rec_loop.append(float(m["rec"]))

    st_scan = create_train_state(vae.apply, vae_params, optax.sgd(1e-2))
    many = make_vae_train_many(step)
    st_scan, losses = many(st_scan, pool, jnp.asarray(idx), jnp.asarray(ids), key)
    assert losses.shape == (K, 3)
    np.testing.assert_allclose(np.asarray(losses[:, 1]), rec_loop, rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(st_loop.params),
        jax.tree_util.tree_leaves(st_scan.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_controlnet_fused_train_step_matches(key):
    """Fused stacked-tower ControlNet training (gradients through the vmap
    to the CN lane only) == the sequential CN->frozen-UNet step."""
    import optax

    unet, vae, sched, unet_params, vae_params, prompt, batch = _setup(key)
    cn = ControlNet(block_out_channels=TINY["block_out_channels"], heads=2, context_dim=16)
    cn_params = cn.init(
        key, jnp.zeros((1, 8, 8, 4)), jnp.array([1]), jnp.zeros((1, 7, 16)),
        jnp.zeros((1, 64, 64, 3)),
    )
    # Perturb the zero-init output convs so the residual join contributes.
    cn_params = jax.tree_util.tree_map(
        lambda a: a + 0.01 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape) / a.size,
        cn_params,
    )
    frozen = {"unet": unet_params, "vae": vae_params}
    results = {}
    for fused in (False, True):
        step = make_controlnet_train_step(unet, cn, vae, sched, prompt, fused=fused)
        state = create_train_state(cn.apply, cn_params, optax.sgd(1e-2))
        state, m = step(state, frozen, batch, key)
        results[fused] = (float(m["loss"]), state.params)
    np.testing.assert_allclose(results[True][0], results[False][0], rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(results[True][1]),
        jax.tree_util.tree_leaves(results[False][1]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        )
