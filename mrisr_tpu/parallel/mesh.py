"""Device mesh and sharding helpers (data-parallel over the batch/slice dim).

The reference is single-process single-GPU (SURVEY.md §2 "Parallelism
strategies" row: none).  The TPU-native scale-out story, per §7: shard the
*batch/slice* dimension across a v5e slice with ``NamedSharding``; XLA
inserts the psum for gradients over ICI.  Sequence/tensor/pipeline
parallelism are genuinely N/A at this model scale and documented as such.

A single mesh axis ``"data"`` covers the deployment target (v5e-8).  The
helpers keep everything pjit-first: parameters replicated, batches sharded
on axis 0, gradients averaged implicitly by jit over the sharded loss.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard dim 0, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis: str = "data") -> Any:
    """Device-put a pytree of host arrays with dim-0 sharding."""

    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, batch_sharding(mesh, x.ndim, axis))

    return jax.tree_util.tree_map(put, batch)


def replicate_params(mesh: Mesh, params: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), params)


# ---------------------------------------------------------------------------
# 2D mesh: data x model (tensor parallelism over wide channel dims)
# ---------------------------------------------------------------------------


def make_mesh_2d(dp: int, mp: int, axes: tuple[str, str] = ("data", "model")) -> Mesh:
    """``dp x mp`` mesh.  At this model's scale pure DP is the right default
    (SURVEY §7); the 2D path exists for wider configs and is exercised by
    the driver dryrun so the TP sharding compiles and runs.
    """
    devs = jax.devices()[: dp * mp]
    return Mesh(np.asarray(devs).reshape(dp, mp), axes)


def tp_param_sharding(mesh: Mesh, min_channels: int = 64, axis: str = "model"):
    """Sharding rule: split the OUTPUT-channel (last) dim of large kernels
    across the model axis; replicate everything else.

    Conv kernels [kh, kw, cin, cout] and Dense kernels [cin, cout] both
    carry cout last, so one rule covers the pytree.  XLA/GSPMD inserts the
    all-gathers/reduce-scatters over ICI; no hand-written collectives.
    """
    mp = mesh.shape[axis]

    def rule(x):
        if x.ndim >= 2 and x.shape[-1] >= min_channels and x.shape[-1] % mp == 0:
            spec = P(*([None] * (x.ndim - 1)), axis)
        else:
            spec = P()
        return NamedSharding(mesh, spec)

    return rule


def shard_params_tp(mesh: Mesh, params: Any, min_channels: int = 64) -> Any:
    """Device-put params with the TP rule (wide cout split over 'model')."""
    rule = tp_param_sharding(mesh, min_channels)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rule(x)), params)
