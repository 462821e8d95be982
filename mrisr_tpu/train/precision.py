"""Mixed-precision policy: fp32 params/optimizer, bf16 compute.

The reference trains the PEFT path in fp16 via accelerate
(``mixed_precision: "fp16"``, config cell 11).  On TPU the native story is
bfloat16 compute with fp32 master params: the loss function casts params
and batch to the compute dtype for the forward/backward, while gradients
flow back to the fp32 tree (``astype`` is differentiable; its VJP upcasts),
so the optimizer state and updates stay full-precision.  No loss scaling is
needed — bf16 has fp32's exponent range.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Policy:
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, tree):
        return _cast_floating(tree, self.compute_dtype)

    def cast_to_param(self, tree):
        return _cast_floating(tree, self.param_dtype)


def _cast_floating(tree, dtype):
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def get_policy(name: str | None) -> Policy:
    """'bfloat16'/'bf16' -> bf16 compute; None/'float32'/'fp32' -> pure fp32."""
    if name in (None, "float32", "fp32", "none"):
        return Policy()
    if name in ("bfloat16", "bf16", "mixed"):
        return Policy(compute_dtype=jnp.bfloat16)
    raise ValueError(f"unknown precision policy {name!r}")
