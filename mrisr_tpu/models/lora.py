"""LoRA as functional pytree weight deltas — no hook injection.

The reference's LoRA path (config cell 11 ``lora_alpha``/``lora_rank``;
the stripped training notebook) would use PEFT's module hooks.  Per the
BASELINE.json north star, here LoRA is *weight composition*: low-rank (A, B)
factors live in their own pytree, and :func:`merge_lora` folds
``W + (alpha/rank) * A @ B`` into a flat copy of the base params so
inference runs with zero overhead; :func:`apply_lora_delta` produces the
merged pytree on the fly for training (gradients flow only to A/B).

Targets any 2D Dense kernel whose path matches ``target_patterns``
(by default the attention projections, diffusers' LoRA convention).
"""
from __future__ import annotations

import re
from typing import Any

import jax
import jax.numpy as jnp
import flax


DEFAULT_TARGETS = (r"to_q", r"to_k", r"to_v", r"to_out")


def _flatten(params: Any):
    return flax.traverse_util.flatten_dict(flax.core.unfreeze(params))


def _unflatten(flat: dict):
    return flax.traverse_util.unflatten_dict(flat)


def _is_target(path: tuple, kernel: jnp.ndarray, patterns) -> bool:
    if path[-1] != "kernel" or kernel.ndim != 2:
        return False
    joined = "/".join(str(p) for p in path)
    return any(re.search(p, joined) for p in patterns)


def init_lora_params(
    key: jax.Array,
    base_params: Any,
    rank: int = 4,
    target_patterns=DEFAULT_TARGETS,
) -> dict:
    """Create {path: {'a': [in, r], 'b': [r, out]}} for every matched kernel.

    ``a`` is gaussian(1/rank) and ``b`` zeros, so the initial delta is zero
    (standard LoRA init).
    """
    flat = _flatten(base_params)
    lora = {}
    for path, w in flat.items():
        if _is_target(path, w, target_patterns):
            key, sub = jax.random.split(key)
            d_in, d_out = w.shape
            lora[path] = {
                "a": jax.random.normal(sub, (d_in, rank), w.dtype) / rank,
                "b": jnp.zeros((rank, d_out), w.dtype),
            }
    return lora


def apply_lora_delta(base_params: Any, lora: dict, alpha: float = 1.0) -> Any:
    """Merged params pytree: W' = W + (alpha/rank) A @ B (differentiable)."""
    flat = dict(_flatten(base_params))
    for path, ab in lora.items():
        rank = ab["a"].shape[1]
        flat[path] = flat[path] + (alpha / rank) * (ab["a"] @ ab["b"])
    return _unflatten(flat)


def merge_lora(base_params: Any, lora: dict, alpha: float = 1.0) -> Any:
    """Permanent merge for zero-overhead inference (stop-gradient copy)."""
    return jax.tree_util.tree_map(
        jax.lax.stop_gradient, apply_lora_delta(base_params, lora, alpha)
    )


def count_lora_params(lora: dict) -> int:
    return sum(int(ab["a"].size + ab["b"].size) for ab in lora.values())
