"""Training steps for the latent PEFT path (LoRA / ControlNet / T2I-Adapter).

The reference's LoRA/ControlNet training notebook was stripped from the
mirror (SURVEY.md top note); semantics are reconstructed from the
hyperparameter surface (``src/adapters/utils.py:37-71`` ``log_configs``,
config cell 11) and the Res-SRDiff math in ``src/adapters/res_srdiff.py``:

* VAE-encode HR and LR slices; diffuse HR latents toward the LR anchor with
  the shifting process; predict epsilon; MSE.
* ControlNet mode: gradients flow to ControlNet params only (UNet frozen).
* LoRA mode: gradients flow to LoRA (A, B) factors only; the merged UNet is
  rebuilt functionally each step (models/lora.py).
* Adapter mode: gradients to the T2I-Adapter only; features add into the
  UNet down blocks.
* CFG dropout: each sample's text embedding is replaced by the empty-prompt
  embedding with probability ``proportion_empty_prompts`` (cell 11: 0.1).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from mrisr_tpu.diffusion import res_shift
from mrisr_tpu.diffusion.schedules import Schedule
from mrisr_tpu.models.lora import apply_lora_delta
from mrisr_tpu.train.losses import l2
from mrisr_tpu.train.state import TrainState


def _cfg_dropout(ctx, empty_ctx, key, p):
    if p <= 0.0 or empty_ctx is None:
        return ctx
    B = ctx.shape[0]
    drop = jax.random.bernoulli(key, p, (B,))
    return jnp.where(drop[:, None, None], empty_ctx, ctx)


def _diffused_batch(sched: Schedule, hr_lat, lr_lat, key):
    B = hr_lat.shape[0]
    k_t, k_eps = jax.random.split(key)
    t = jax.random.randint(k_t, (B,), 0, sched.num_timesteps)
    eps = jax.random.normal(k_eps, hr_lat.shape, hr_lat.dtype)
    x_t = res_shift.shift_forward(sched, hr_lat, lr_lat, t, eps)
    return x_t, t, eps


def _encode_pair(vae, frozen, batch, k1, k2, latents_cached: bool):
    """Scaled (hr, lr) latents for a train step.

    ``latents_cached=False`` VAE-encodes the pixel batch (the original
    path).  ``latents_cached=True`` samples the posterior from PRECOMPUTED
    moments (``hr_mean/hr_logvar/lr_mean/lr_logvar`` batch keys) with the
    exact ``AutoencoderKL.encode`` formula — distributionally identical,
    and bit-matching at equal keys (tested).  Caching removes the two
    per-step 256^2 encoder forwards that made 256^2 training chunks blow
    the relay's per-dispatch chip-time limit (round-15: a 250-step VAE
    chunk crashed the worker; PERF.md round-8 limits).  Pixel ``lr`` stays
    in the batch for the ControlNet/adapter condition branches, which ARE
    trainable and must see pixels.
    """
    scale = vae.scaling_factor
    if latents_cached:
        hr_lat = batch["hr_mean"] + jnp.exp(0.5 * batch["hr_logvar"]) * (
            jax.random.normal(k1, batch["hr_mean"].shape, batch["hr_mean"].dtype)
        )
        lr_lat = batch["lr_mean"] + jnp.exp(0.5 * batch["lr_logvar"]) * (
            jax.random.normal(k2, batch["lr_mean"].shape, batch["lr_mean"].dtype)
        )
        return hr_lat * scale, lr_lat * scale
    hr_rgb = jnp.repeat(batch["hr"], 3, axis=-1)
    lr_rgb = jnp.repeat(batch["lr"], 3, axis=-1)
    hr_lat = vae.apply(frozen["vae"], hr_rgb, k1, method=vae.encode) * scale
    lr_lat = vae.apply(frozen["vae"], lr_rgb, k2, method=vae.encode) * scale
    return hr_lat, lr_lat


def make_vae_train_step(vae, kl_weight: float = 1e-6) -> Callable:
    """AutoencoderKL training: reconstruction MSE + KL(q(z|x) || N(0, I)).

    The reference path uses diffusers' FROZEN pretrained SD1.5 VAE
    (``src/adapters/res_srdiff.py:50,110``); no checkpoint exists in the
    zero-egress image, so phantom-scale fidelity evidence (eval/parity.py::
    run_phantom_latent) trains a small AutoencoderKL itself.  The tiny KL
    weight matches the SD-VAE regime (posterior far from the prior,
    near-deterministic latents; the diffusion model supplies the prior).
    """

    @jax.jit
    def step(state: TrainState, batch: dict, key: jax.Array):
        x = jnp.repeat(batch["img"], 3, axis=-1) if batch["img"].shape[-1] == 1 else batch["img"]

        def loss_fn(p):
            mean, logvar = vae.apply(p, x, method=vae.encode_moments)
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                key, mean.shape, mean.dtype
            )
            rec = vae.apply(p, z, method=vae.decode)
            rec_loss = l2(rec, x)
            kl = 0.5 * jnp.mean(
                jnp.sum(mean**2 + jnp.exp(logvar) - 1.0 - logvar, axis=(1, 2, 3))
            )
            return rec_loss + kl_weight * kl, (rec_loss, kl)

        (loss, (rec_loss, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss, "rec": rec_loss, "kl": kl}

    return step


def make_latent_base_train_step(
    unet, vae, sched: Schedule, prompt_embeds, empty_embeds=None,
    proportion_empty_prompts: float = 0.1, prediction_type: str = "epsilon",
    latents_cached: bool = False,
) -> Callable:
    """BASE latent-diffusion training: gradients to the UNET itself.

    The reference starts from a pretrained SD1.5 UNet and only fine-tunes
    PEFT modules; with no pretrained checkpoint in the image, the
    phantom-scale parity leg pre-trains a small SDUNet on the same
    res-shift objective the PEFT steps use (x_t from ``shift_forward``,
    eps-prediction MSE — ``src/adapters/res_srdiff.py:7-25`` semantics),
    then freezes it as the base for ControlNet / LoRA fine-tuning.
    """

    @jax.jit
    def step(state: TrainState, frozen: dict, batch: dict, key: jax.Array):
        k_enc1, k_enc2, k_diff, k_cfg = jax.random.split(key, 4)
        hr_lat, lr_lat = _encode_pair(
            vae, frozen, batch, k_enc1, k_enc2, latents_cached
        )

        x_t, t, eps = _diffused_batch(sched, hr_lat, lr_lat, k_diff)
        B = hr_lat.shape[0]
        ctx = jnp.broadcast_to(prompt_embeds[:1], (B,) + prompt_embeds.shape[1:])
        ctx = _cfg_dropout(ctx, empty_embeds, k_cfg, proportion_empty_prompts)

        target = hr_lat if prediction_type == "sample" else eps

        def loss_fn(unet_params):
            pred = unet.apply(unet_params, x_t, t, ctx)
            return l2(pred, target)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss}

    return step


def make_controlnet_train_step(
    unet, controlnet, vae, sched: Schedule, prompt_embeds, empty_embeds=None,
    proportion_empty_prompts: float = 0.1, fused: bool | None = None,
    prediction_type: str = "epsilon", latents_cached: bool = False,
) -> Callable:
    """ControlNet fine-tuning: state.params = controlnet params.

    ``fused`` runs the ControlNet and (frozen) UNet down+mid towers as ONE
    vmapped stacked-weight program per step — the same rewrite that
    measured +30% on the 20-step serving chain (``models/fused.py``,
    PERF.md round-13); gradients flow through the stack to the ControlNet
    lane only.  Default (None) = auto: fused whenever the two encoder
    configs match.  Identical math either way (equivalence pinned in
    tests/test_latent_train.py::test_controlnet_fused_train_step_matches).
    """
    from mrisr_tpu.models.controlnet import embed_condition
    from mrisr_tpu.models.fused import check_fusable, fused_eps, stack_tower_params

    if fused is None:
        try:
            check_fusable(unet, controlnet)
            fused = True
        except ValueError:
            fused = False
    elif fused:
        check_fusable(unet, controlnet)

    @jax.jit
    def step(state: TrainState, frozen: dict, batch: dict, key: jax.Array):
        k_enc1, k_enc2, k_diff, k_cfg = jax.random.split(key, 4)
        lr_rgb = jnp.repeat(batch["lr"], 3, axis=-1)
        hr_lat, lr_lat = _encode_pair(
            vae, frozen, batch, k_enc1, k_enc2, latents_cached
        )

        x_t, t, eps = _diffused_batch(sched, hr_lat, lr_lat, k_diff)
        B = hr_lat.shape[0]
        ctx = jnp.broadcast_to(prompt_embeds[:1], (B,) + prompt_embeds.shape[1:])
        ctx = _cfg_dropout(ctx, empty_embeds, k_cfg, proportion_empty_prompts)

        target = hr_lat if prediction_type == "sample" else eps

        def loss_fn(cn_params):
            if fused:
                cond_emb = embed_condition(controlnet, cn_params, lr_rgb)
                stacked = stack_tower_params(frozen["unet"], cn_params)
                pred = fused_eps(
                    unet, controlnet, frozen["unet"], cn_params, stacked,
                    x_t, t, ctx, cond_emb,
                )
            else:
                down_res, mid_res = controlnet.apply(cn_params, x_t, t, ctx, lr_rgb)
                pred = unet.apply(
                    frozen["unet"], x_t, t, ctx,
                    down_block_additional_residuals=down_res,
                    mid_block_additional_residual=mid_res,
                )
            return l2(pred, target)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss}

    return step


def make_lora_train_step(
    unet, vae, sched: Schedule, prompt_embeds, base_unet_params,
    lora_alpha: float = 1.0, empty_embeds=None, proportion_empty_prompts: float = 0.1,
    prediction_type: str = "epsilon", latents_cached: bool = False,
) -> Callable:
    """LoRA fine-tuning: state.params = the LoRA (A, B) pytree."""

    @jax.jit
    def step(state: TrainState, frozen: dict, batch: dict, key: jax.Array):
        k_enc1, k_enc2, k_diff, k_cfg = jax.random.split(key, 4)
        hr_lat, lr_lat = _encode_pair(
            vae, frozen, batch, k_enc1, k_enc2, latents_cached
        )

        x_t, t, eps = _diffused_batch(sched, hr_lat, lr_lat, k_diff)
        B = hr_lat.shape[0]
        ctx = jnp.broadcast_to(prompt_embeds[:1], (B,) + prompt_embeds.shape[1:])
        ctx = _cfg_dropout(ctx, empty_embeds, k_cfg, proportion_empty_prompts)

        target = hr_lat if prediction_type == "sample" else eps

        def loss_fn(lora):
            merged = apply_lora_delta(base_unet_params, lora, lora_alpha)
            pred = unet.apply(merged, x_t, t, ctx)
            return l2(pred, target)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss}

    return step


def make_latent_train_many(step: Callable) -> Callable:
    """Scanned K-step wrapper around any ``(state, frozen, batch, key)``
    latent train step (base / ControlNet / LoRA / adapter factories above).

    ``many(state, frozen, lr_all, hr_all, idx, step_ids, key) ->
    (state, losses)`` runs ``K = idx.shape[0]`` optimizer steps inside ONE
    jitted ``lax.scan`` over a device-resident training set — the same
    dispatch-amortization as ``train/steps.py::make_resdiff_train_many``
    (through the axon relay every dispatch carries ~50-80 ms RPC overhead,
    so per-step training is RPC-bound).  Batch ``i`` is the gather
    ``(lr_all[idx[i]], hr_all[idx[i]])`` and its PRNG key is
    ``fold_in(key, step_ids[i])`` — exactly the walk the per-step loop in
    ``eval/parity.py::run_phantom_latent`` derives, so a scanned run
    reproduces the loop's trajectory up to XLA lowering reassociation
    (~1e-6 per step on CPU; pinned with SGD in tests/test_latent_train.py —
    same batches, same keys, same losses).

    The inner ``step`` may be the already-jitted factory output: jit under
    trace inlines.
    """

    @jax.jit
    def many(state, frozen, lr_all, hr_all, idx, step_ids, key):
        def body(st, per):
            ix, sid = per
            batch = {"lr": lr_all[ix], "hr": hr_all[ix]}
            st, m = step(st, frozen, batch, jax.random.fold_in(key, sid))
            return st, m["loss"]

        return jax.lax.scan(body, state, (idx, step_ids))

    return many


def make_vae_train_many(step: Callable) -> Callable:
    """Scanned K-step wrapper for :func:`make_vae_train_step` outputs.

    ``many(state, pool, idx, step_ids, key) -> (state, [K, 3] losses)``
    with per-step rows ``(loss, rec, kl)``; key/batch walk as in
    :func:`make_latent_train_many`.
    """

    @jax.jit
    def many(state, pool, idx, step_ids, key):
        def body(st, per):
            ix, sid = per
            st, m = step(st, {"img": pool[ix]}, jax.random.fold_in(key, sid))
            return st, jnp.stack([m["loss"], m["rec"], m["kl"]])

        return jax.lax.scan(body, state, (idx, step_ids))

    return many


def make_latent_train_many_cached(step: Callable) -> Callable:
    """Scanned K-step wrapper over a CACHED-LATENT training set.

    ``many(state, frozen, arrays, idx, step_ids, key) -> (state, losses)``
    where ``arrays`` is a dict of stacked per-image arrays (the
    ``latents_cached=True`` batch keys: hr_mean/hr_logvar/lr_mean/
    lr_logvar/lr); batch ``i`` gathers row ``idx[i]`` from every array.
    Same dispatch-amortization and key walk as
    :func:`make_latent_train_many`.
    """

    @jax.jit
    def many(state, frozen, arrays, idx, step_ids, key):
        def body(st, per):
            ix, sid = per
            batch = {k: v[ix] for k, v in arrays.items()}
            st, m = step(st, frozen, batch, jax.random.fold_in(key, sid))
            return st, m["loss"]

        return jax.lax.scan(body, state, (idx, step_ids))

    return many


def make_adapter_train_step(
    unet, adapter, vae, sched: Schedule, prompt_embeds, empty_embeds=None,
    proportion_empty_prompts: float = 0.1, prediction_type: str = "epsilon",
    latents_cached: bool = False,
) -> Callable:
    """T2I-Adapter fine-tuning: state.params = adapter params.

    Feature-parity with the sibling factories (VERDICT round-4 weak #4):
    ``prediction_type`` selects the diffusers target convention
    ("epsilon" | "sample"), CFG dropout replaces the text embedding with
    the empty-prompt embedding per sample, and the ``(state, frozen,
    batch, key)`` signature is :func:`make_latent_train_many`-compatible.
    Reference adapter shape: ``src/adapters/modules.py:114-157``.
    """

    @jax.jit
    def step(state: TrainState, frozen: dict, batch: dict, key: jax.Array):
        k_enc1, k_enc2, k_diff, k_cfg = jax.random.split(key, 4)
        lr_rgb = jnp.repeat(batch["lr"], 3, axis=-1)
        hr_lat, lr_lat = _encode_pair(
            vae, frozen, batch, k_enc1, k_enc2, latents_cached
        )

        x_t, t, eps = _diffused_batch(sched, hr_lat, lr_lat, k_diff)
        B = hr_lat.shape[0]
        ctx = jnp.broadcast_to(prompt_embeds[:1], (B,) + prompt_embeds.shape[1:])
        ctx = _cfg_dropout(ctx, empty_embeds, k_cfg, proportion_empty_prompts)

        target = hr_lat if prediction_type == "sample" else eps

        def loss_fn(ad_params):
            feats = adapter.apply(ad_params, lr_rgb)
            pred = unet.apply(frozen["unet"], x_t, t, ctx, adapter_features=feats)
            return l2(pred, target)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss}

    return step


def make_cn_lora_train_step(
    unet, controlnet, vae, sched: Schedule, prompt_embeds, base_unet_params,
    lora_alpha: float = 1.0, empty_embeds=None,
    proportion_empty_prompts: float = 0.1, fused: bool | None = None,
    prediction_type: str = "epsilon", latents_cached: bool = False,
) -> Callable:
    """Combined ControlNet + LoRA fine-tuning — the reference notebook's
    actual configuration (``artificial_ds_lora_controlnet.ipynb``, stripped;
    hyperparameter surface at ``src/adapters/utils.py:37-71`` carries BOTH
    ``lora_rank``/``lora_alpha`` and the ControlNet path).

    ``state.params = {"cn": controlnet params, "lora": LoRA (A,B) pytree}``
    — gradients flow to both jointly; the UNet base stays frozen and is
    rebuilt functionally each step as ``merge(base, lora)``.  The fused
    stacked-tower program works unchanged because the LoRA-merged UNet
    params have identical tree structure/shapes (``models/fused.py``).
    """
    from mrisr_tpu.models.controlnet import embed_condition
    from mrisr_tpu.models.fused import check_fusable, fused_eps, stack_tower_params

    if fused is None:
        try:
            check_fusable(unet, controlnet)
            fused = True
        except ValueError:
            fused = False
    elif fused:
        check_fusable(unet, controlnet)

    @jax.jit
    def step(state: TrainState, frozen: dict, batch: dict, key: jax.Array):
        k_enc1, k_enc2, k_diff, k_cfg = jax.random.split(key, 4)
        lr_rgb = jnp.repeat(batch["lr"], 3, axis=-1)
        hr_lat, lr_lat = _encode_pair(
            vae, frozen, batch, k_enc1, k_enc2, latents_cached
        )

        x_t, t, eps = _diffused_batch(sched, hr_lat, lr_lat, k_diff)
        B = hr_lat.shape[0]
        ctx = jnp.broadcast_to(prompt_embeds[:1], (B,) + prompt_embeds.shape[1:])
        ctx = _cfg_dropout(ctx, empty_embeds, k_cfg, proportion_empty_prompts)

        target = hr_lat if prediction_type == "sample" else eps

        def loss_fn(p):
            merged = apply_lora_delta(base_unet_params, p["lora"], lora_alpha)
            if fused:
                cond_emb = embed_condition(controlnet, p["cn"], lr_rgb)
                stacked = stack_tower_params(merged, p["cn"])
                pred = fused_eps(
                    unet, controlnet, merged, p["cn"], stacked,
                    x_t, t, ctx, cond_emb,
                )
            else:
                down_res, mid_res = controlnet.apply(p["cn"], x_t, t, ctx, lr_rgb)
                pred = unet.apply(
                    merged, x_t, t, ctx,
                    down_block_additional_residuals=down_res,
                    mid_block_additional_residual=mid_res,
                )
            return l2(pred, target)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss}

    return step
