"""Fused ControlNet+UNet encoder towers for the latent SR path.

PERF.md round-11 observed that per sampler step the ControlNet forward is
~55% of the UNet's FLOPs and runs strictly BEFORE it, yet the two networks'
down+mid towers are topologically IDENTICAL (ControlNet is by construction
a weight-copy of the UNet encoder: reference ``src/adapters/res_srdiff.py``
drives diffusers' ``ControlNetModel.from_unet``; mrisr_tpu mirrors that in
``models/controlnet.py``).  Dataflow-wise they are also INDEPENDENT: the
UNet's down tower and mid block never consume ControlNet outputs — the
zero-conv residuals join only (a) additively into the skip list after the
down tower and (b) additively after the mid block (``sd_unet.py:164-169``).

So the two towers can run as ONE program over a stacked leading axis of
size 2: every matmul/conv in the encoder becomes a single batched op with
double the work, halving per-op dispatch/relayout overhead and keeping the
MXU fed at small batch sizes.  Implementation: a ``DownMidTower`` module
whose parameter tree is EXACTLY the shared subtree of both networks
(``conv_in``, ``time_embedding``, ``down_blocks_i``, ``mid_block`` — the
1:1 diffusers naming guarantees structural equality), vmapped over
``jnp.stack([unet_subtree, cn_subtree])``.  The UNet-only decode half runs
afterwards as ``UNetUpTower`` on the remaining UNet params.

The math is IDENTICAL to the unfused path (same ops, vmap-batched);
equivalence is pinned by tests/test_latent_train.py::test_fused_towers_*.
Whether the batched lowering actually wins on TPU is an empirical A/B
(``bench.py --pipeline latent --fused``) — verdict in PERF.md.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mrisr_tpu.models.sd_layers import (
    gn_groups,
    TimestepEmbedding,
    Timesteps,
)
from mrisr_tpu.models.sd_unet import (
    CrossAttnDownBlock,
    CrossAttnUpBlock,
    DownBlock,
    MidBlock,
    UpBlock,
)

#: parameter keys shared 1:1 between SDUNet and ControlNet (same module
#: classes, same names — models/controlnet.py deliberately reuses the
#: sd_unet blocks so checkpoints convert identically).
def shared_tower_keys(n_blocks: int) -> list[str]:
    return (
        ["conv_in", "time_embedding", "mid_block"]
        + [f"down_blocks_{i}" for i in range(n_blocks)]
    )


class DownMidTower(nn.Module):
    """The encoder half common to SDUNet and ControlNet.

    ``post_conv_add`` is added right after ``conv_in`` — zeros for the UNet
    lane, the (precomputed, step-invariant) condition embedding for the
    ControlNet lane (``controlnet.py:82-87``).
    """

    block_out_channels: Sequence[int]
    layers_per_block: int
    heads: int
    context_dim: int

    @nn.compact
    def __call__(self, x, t, context, post_conv_add):
        ch = self.block_out_channels
        temb = Timesteps(ch[0], name="time_proj")(t)
        temb = TimestepEmbedding(ch[0] * 4, name="time_embedding")(temb).astype(x.dtype)

        h = nn.Conv(ch[0], (3, 3), padding="SAME", name="conv_in")(x)
        h = h + post_conv_add
        skips = [h]
        for i, c in enumerate(ch):
            is_last = i == len(ch) - 1
            if not is_last:
                h, res = CrossAttnDownBlock(
                    c, self.heads, self.layers_per_block, True, self.context_dim,
                    name=f"down_blocks_{i}",
                )(h, temb, context)
            else:
                h, res = DownBlock(
                    c, self.layers_per_block, False, name=f"down_blocks_{i}"
                )(h, temb)
            skips.extend(res)
        h = MidBlock(ch[-1], self.heads, self.context_dim, name="mid_block")(h, temb, context)
        return h, skips, temb


class UNetUpTower(nn.Module):
    """The SDUNet decode half (``sd_unet.py:171-186``), applied on the
    UNet's own ``up_blocks_i`` / ``conv_norm_out`` / ``conv_out`` subtree."""

    block_out_channels: Sequence[int]
    layers_per_block: int
    heads: int
    context_dim: int
    out_channels: int = 4

    @nn.compact
    def __call__(self, h, skips, temb, context):
        ch = self.block_out_channels
        rev = list(reversed(ch))
        for i, c in enumerate(rev):
            is_last = i == len(rev) - 1
            if i == 0:
                h = UpBlock(
                    c, self.layers_per_block + 1, not is_last, name=f"up_blocks_{i}"
                )(h, skips, temb)
            else:
                h = CrossAttnUpBlock(
                    c, self.heads, self.layers_per_block + 1, not is_last,
                    self.context_dim, name=f"up_blocks_{i}",
                )(h, skips, temb, context)
        h = nn.GroupNorm(num_groups=gn_groups(ch[0]), epsilon=1e-5, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME", name="conv_out")(h)


def check_fusable(unet, controlnet) -> None:
    """The fused path requires the two encoder configs to coincide (they do
    for any ControlNet built ``from_unet``-style, which is the only kind the
    reference path produces)."""
    for attr in ("block_out_channels", "layers_per_block", "heads", "context_dim"):
        a, b = getattr(unet, attr), getattr(controlnet, attr)
        norm = lambda v: tuple(v) if isinstance(v, (tuple, list)) else v
        if norm(a) != norm(b):
            raise ValueError(
                f"fused towers need matching UNet/ControlNet configs; "
                f"{attr}: unet={a} controlnet={b}"
            )


def stack_tower_params(unet_params: Any, cn_params: Any) -> Any:
    """``jnp.stack`` the shared encoder subtrees leaf-wise: [2, ...] with
    lane 0 = UNet, lane 1 = ControlNet."""
    n_blocks = len(
        [k for k in unet_params["params"] if k.startswith("down_blocks_")]
    )
    keys = shared_tower_keys(n_blocks)
    sub_u = {k: unet_params["params"][k] for k in keys}
    sub_c = {k: cn_params["params"][k] for k in keys}
    return jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), sub_u, sub_c)


def _conv1x1(params: Any, x: jnp.ndarray) -> jnp.ndarray:
    return nn.Conv(x.shape[-1], (1, 1)).apply({"params": params}, x)


def fused_eps(
    unet,
    controlnet,
    unet_params: Any,
    cn_params: Any,
    stacked_tower: Any,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    context: jnp.ndarray,
    cond_embedding: jnp.ndarray,
) -> jnp.ndarray:
    """One eps-prediction step: fused (UNet ∥ ControlNet) encoder, zero-conv
    residual join, UNet decode.  Bit-identical math to
    ``pipelines/latent.py::eps_fn`` (unfused)."""
    ch = tuple(unet.block_out_channels)
    tower = DownMidTower(ch, unet.layers_per_block, unet.heads, unet.context_dim)
    adds = jnp.stack([jnp.zeros_like(cond_embedding), cond_embedding])

    h_mid, skips, temb = jax.vmap(
        lambda p, a: tower.apply({"params": p}, x_t, t, context, a)
    )(stacked_tower, adds)

    scale = controlnet.conditioning_scale
    cp = cn_params["params"]
    down_res = [
        _conv1x1(cp[f"controlnet_down_blocks_{i}"], s[1]) * scale
        for i, s in enumerate(skips)
    ]
    mid_res = _conv1x1(cp["controlnet_mid_block"], h_mid[1]) * scale

    skips_u = [s[0] + r for s, r in zip(skips, down_res)]
    h = h_mid[0] + mid_res

    up = UNetUpTower(
        ch, unet.layers_per_block, unet.heads, unet.context_dim, unet.out_channels
    )
    up_keys = [k for k in unet_params["params"] if k.startswith("up_blocks_")]
    up_sub = {k: unet_params["params"][k] for k in up_keys}
    up_sub["conv_norm_out"] = unet_params["params"]["conv_norm_out"]
    up_sub["conv_out"] = unet_params["params"]["conv_out"]
    return up.apply({"params": up_sub}, h, skips_u, temb[0], context)
