"""Training state, optimizers and LR schedules.

Replaces the reference's ad-hoc torch training scaffolding:

* Adam(lr 1e-4) for the Stage-1 CNN (``ResDif_execution.ipynb`` cell 29)
* Adam(lr 1e-5) for ResDiff Stage-2 (cell 37 "train.optimizer")
* AdamW-style settings + cosine schedule with 500 warmup steps + grad-norm
  clip 1.0 + (8-bit) Adam for the PEFT path (config cell 11) — 8-bit Adam is
  a CUDA bitsandbytes feature; on TPU we expose the same memory saving via
  ``optax.adafactor`` or plain adamw (documented substitution).

Includes optional EMA of parameters (standard diffusion practice).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    ema_params: Any = None
    ema_decay: float = struct.field(pytree_node=False, default=0.0)

    def apply_gradients(self, *, grads, **kwargs):
        new_state = super().apply_gradients(grads=grads, **kwargs)
        if self.ema_params is not None:
            d = self.ema_decay
            new_ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p, self.ema_params, new_state.params
            )
            new_state = new_state.replace(ema_params=new_ema)
        return new_state


def make_lr_schedule(
    name: str = "constant",
    base_lr: float = 1e-4,
    warmup_steps: int = 0,
    total_steps: int = 100_000,
    num_cycles: float = 1.0,
) -> optax.Schedule:
    """'constant' | 'cosine' (with warmup) | 'linear' — config cell 11 names."""
    if name == "constant":
        if warmup_steps > 0:
            return optax.linear_schedule(0.0, base_lr, warmup_steps)
        return optax.constant_schedule(base_lr)
    if name == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=base_lr,
            warmup_steps=max(warmup_steps, 1),
            # decay_steps is the TOTAL length incl. warmup; clamp so short
            # smoke runs (steps < warmup) don't hit optax's negative-length
            # ValueError.
            decay_steps=max(total_steps, max(warmup_steps, 1) + 1),
            end_value=0.0,
        )
    if name == "linear":
        schedules = [
            optax.linear_schedule(0.0, base_lr, max(warmup_steps, 1)),
            optax.linear_schedule(base_lr, 0.0, max(total_steps - warmup_steps, 1)),
        ]
        return optax.join_schedules(schedules, [warmup_steps])
    raise ValueError(f"unknown lr schedule {name!r}")


def make_optimizer(
    lr: float | optax.Schedule = 1e-4,
    kind: str = "adam",
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    max_grad_norm: float | None = None,
    grad_accum: int = 1,
    skip_nonfinite: bool = False,
) -> optax.GradientTransformation:
    if kind == "adam":
        tx = optax.adam(lr, b1=b1, b2=b2, eps=eps)
    elif kind == "adamw":
        tx = optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
    elif kind == "adafactor":
        # TPU-friendly low-memory optimizer standing in for 8-bit Adam.
        tx = optax.adafactor(lr)
    else:
        raise ValueError(f"unknown optimizer {kind!r}")
    if max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    if skip_nonfinite:
        # Failure containment the reference lacks: a NaN/inf gradient step
        # is skipped (params/opt-state untouched) instead of poisoning the
        # run; training aborts only after many consecutive bad steps.
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    if grad_accum > 1:
        # Reference parity: gradient_accumulation_steps (config cell 11).
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def create_train_state(
    apply_fn: Callable,
    params: Any,
    tx: optax.GradientTransformation,
    ema_decay: float = 0.0,
) -> TrainState:
    return TrainState.create(
        apply_fn=apply_fn,
        params=params,
        tx=tx,
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if ema_decay > 0 else None,
        ema_decay=ema_decay,
    )
