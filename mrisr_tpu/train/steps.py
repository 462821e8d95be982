"""Jitted train/eval steps for every workload.

One factory per pipeline; each returns a pure jitted function
``(state, batch, key) -> (state, metrics)``.  Batches are NHWC dicts.

Semantics sources:
* Stage-1 CNN (``train_cnn``, ResDif_execution.ipynb cell 29): Adam 1e-4,
  image-compare loss on ``cnn(lr)`` vs HR.
* ResDiff Stage-2 (cells 37/46 + SR3 driver): continuous-gamma q-sample of
  the residual ``HR - cnn_sr``, eps-prediction MSE.
* MNIST (MNIST_Super_Resolution.ipynb cell 9): plain MSE regression, plus
  the intended-DDPM mode.
* Latent/PEFT path: epsilon-prediction on VAE latents with Res-SRDiff
  shifting (reconstructed from src/adapters/* — see train/latent.py).
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from mrisr_tpu.diffusion import ddpm, sr3
from mrisr_tpu.diffusion.schedules import Schedule
from mrisr_tpu.train.losses import image_compare_loss, l2
from mrisr_tpu.train.precision import Policy
from mrisr_tpu.train.state import TrainState


def make_cnn_train_step(model, policy: Policy | None = None) -> Callable:
    policy = policy or Policy()

    @jax.jit
    def step(state: TrainState, batch: dict, key: jax.Array):
        def loss_fn(params):
            p = policy.cast_to_compute(params)
            b = policy.cast_to_compute(batch)
            pred = model.apply(p, b["lr"])
            return image_compare_loss(
                pred.astype(jnp.float32), batch["hr"].astype(jnp.float32)
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss}

    return step


def make_resdiff_train_step(
    unet, sched: Schedule, policy: Policy | None = None, remat: bool = False
) -> Callable:
    """Stage-2: diffuse the residual (HR - cnn_sr), predict eps, MSE.

    With a bf16 ``policy`` the UNet forward/backward runs in bfloat16
    against fp32 master params (train/precision.py); the q-sample and the
    loss stay fp32.  ``remat=True`` rematerialises the UNet forward in the
    backward pass (jax.checkpoint) — trades ~1 extra forward for not
    storing every activation, enabling larger per-chip batches (the
    reference enables torch gradient checkpointing the same way,
    config cell 37 ``use_checkpoint``).
    """
    policy = policy or Policy()

    def apply_unet(params, inp, gamma, k_drop):
        return unet.apply(
            params, inp, gamma, deterministic=False, rngs={"dropout": k_drop}
        )

    if remat:
        apply_unet = jax.checkpoint(apply_unet)

    @jax.jit
    def step(state: TrainState, batch: dict, key: jax.Array):
        sr, hr = batch["sr"], batch["hr"]
        B = hr.shape[0]
        k_t, k_g, k_eps, k_drop = jax.random.split(key, 4)
        t = jax.random.randint(k_t, (B,), 0, sched.num_timesteps)
        gamma = sr3.sample_gamma(sched, t, k_g)
        eps = jax.random.normal(k_eps, hr.shape, hr.dtype)
        x0 = hr - sr
        x_t = sr3.q_sample_gamma(x0, gamma, eps)

        def loss_fn(params):
            p = policy.cast_to_compute(params)
            inp = policy.cast_to_compute(jnp.concatenate([sr, x_t], axis=-1))
            eps_pred = apply_unet(p, inp, gamma, k_drop)
            return l2(eps_pred.astype(jnp.float32), eps.astype(jnp.float32))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss}

    return step


def make_resdiff_train_many(
    unet, sched: Schedule, policy: Policy | None = None, remat: bool = False
) -> Callable:
    """Scanned multi-step variant of :func:`make_resdiff_train_step`.

    ``many(state, sr_all, hr_all, idx, step_ids, key) -> (state, losses)``
    runs ``K = idx.shape[0]`` optimizer steps inside ONE jitted
    ``lax.scan`` program over a device-resident training set.  Per-step
    math is identical to the single-step factory — batch ``i`` is the
    gather ``(sr_all[idx[i]], hr_all[idx[i]])`` and its PRNG key is
    ``fold_in(key, step_ids[i])``, the same key the per-step loop derives
    — so a scanned run reproduces the loop's training trajectory.

    Motivation (PERF.md "Environment caveat"): through the axon relay
    every dispatch carries ~50-80 ms of RPC overhead, so per-step
    training is RPC-bound (~83 ms/step measured for the round-4 parity
    runs).  Scanning K steps per dispatch amortizes the overhead K-fold —
    the same trick as ``ResDiffPipeline.super_resolve_many`` for serving.
    """
    policy = policy or Policy()

    def apply_unet(params, inp, gamma, k_drop):
        return unet.apply(
            params, inp, gamma, deterministic=False, rngs={"dropout": k_drop}
        )

    if remat:
        apply_unet = jax.checkpoint(apply_unet)

    @jax.jit
    def many(
        state: TrainState,
        sr_all: jnp.ndarray,
        hr_all: jnp.ndarray,
        idx: jnp.ndarray,
        step_ids: jnp.ndarray,
        key: jax.Array,
    ):
        def body(st, per):
            ix, sid = per
            sr, hr = sr_all[ix], hr_all[ix]
            B = hr.shape[0]
            k_t, k_g, k_eps, k_drop = jax.random.split(
                jax.random.fold_in(key, sid), 4
            )
            t = jax.random.randint(k_t, (B,), 0, sched.num_timesteps)
            gamma = sr3.sample_gamma(sched, t, k_g)
            eps = jax.random.normal(k_eps, hr.shape, hr.dtype)
            x_t = sr3.q_sample_gamma(hr - sr, gamma, eps)

            def loss_fn(params):
                p = policy.cast_to_compute(params)
                inp = policy.cast_to_compute(jnp.concatenate([sr, x_t], axis=-1))
                eps_pred = apply_unet(p, inp, gamma, k_drop)
                return l2(eps_pred.astype(jnp.float32), eps.astype(jnp.float32))

            loss, grads = jax.value_and_grad(loss_fn)(st.params)
            return st.apply_gradients(grads=grads), loss

        state, losses = jax.lax.scan(body, state, (idx, step_ids))
        return state, losses

    return many


def make_cnn_train_many(model, policy: Policy | None = None) -> Callable:
    """Scanned multi-step variant of :func:`make_cnn_train_step` (see
    :func:`make_resdiff_train_many` for the dispatch-amortization
    rationale)."""
    policy = policy or Policy()

    @jax.jit
    def many(
        state: TrainState,
        lr_all: jnp.ndarray,
        hr_all: jnp.ndarray,
        idx: jnp.ndarray,
    ):
        def body(st, ix):
            def loss_fn(params):
                p = policy.cast_to_compute(params)
                pred = model.apply(p, policy.cast_to_compute(lr_all[ix]))
                return image_compare_loss(
                    pred.astype(jnp.float32), hr_all[ix].astype(jnp.float32)
                )

            loss, grads = jax.value_and_grad(loss_fn)(st.params)
            return st.apply_gradients(grads=grads), loss

        state, losses = jax.lax.scan(body, state, idx)
        return state, losses

    return many


def make_mnist_regression_step(model) -> Callable:
    @jax.jit
    def step(state: TrainState, batch: dict, key: jax.Array):
        def loss_fn(params):
            pred = model.apply(params, batch["lr_up"])
            return l2(pred, batch["hr"])

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss}

    return step


def make_mnist_ddpm_step(model, sched: Schedule) -> Callable:
    """Conditional DDPM: model(concat(x_t, lr_up), t) -> eps."""

    @jax.jit
    def step(state: TrainState, batch: dict, key: jax.Array):
        hr, lr_up = batch["hr"], batch["lr_up"]
        B = hr.shape[0]
        k_t, k_eps = jax.random.split(key)
        t = jax.random.randint(k_t, (B,), 0, sched.num_timesteps)
        eps = jax.random.normal(k_eps, hr.shape, hr.dtype)
        x_t = ddpm.q_sample(sched, hr, t, eps)

        def loss_fn(params):
            inp = jnp.concatenate([x_t, lr_up], axis=-1)
            eps_pred = model.apply(params, inp, t, batch.get("label"))
            return l2(eps_pred, eps)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss}

    return step
