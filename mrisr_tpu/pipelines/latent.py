"""Latent SR pipeline: SD1.5 UNet + ControlNet + Res-SRDiff shifting.

Native rebuild of the reference's PEFT inference path
(``src/adapters/res_srdiff.py:36-105`` ``log_validation``):

1. VAE-encode the LR slice (x scaling factor) as the shifting anchor.
2. Initialise latents at the shifted state x_T ~ LR + noise.
3. Per step (default 20): ControlNet(latents, t, text, pixel LR cond) ->
   down/mid residuals -> UNet eps-prediction -> manual Res-SRDiff reverse
   step re-anchoring on the LR latents.
4. VAE-decode.

Everything (VAE encode, K ControlNet+UNet steps, decode) compiles as one
XLA program; text conditioning is a pre-computed constant embedding
(``get_fixed_prompt_embeds``).  LoRA weights, if given, are merged into the
UNet params ahead of the call (models/lora.py) — zero inference overhead.
"""
from __future__ import annotations

import functools
import hashlib
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from mrisr_tpu.diffusion.schedules import Schedule
from mrisr_tpu.models.controlnet import ControlNet
from mrisr_tpu.models.sd_unet import SDUNet
from mrisr_tpu.models.vae import AutoencoderKL
from mrisr_tpu.ops.resize import interpolate_like_torch
from mrisr_tpu.pipelines.sampler import res_shift_sample


def prepare_condition_image(
    image: jnp.ndarray, target_hw: tuple[int, int] = (512, 512)
) -> jnp.ndarray:
    """1ch -> 3ch and bilinear-resize to the ControlNet input size.

    (res_srdiff.py:27-33 semantics; NHWC.)
    """
    if image.shape[-1] == 1:
        image = jnp.repeat(image, 3, axis=-1)
    if image.shape[1:3] != target_hw:
        nchw = image.transpose(0, 3, 1, 2)
        nchw = interpolate_like_torch(nchw, target_hw, mode="bilinear")
        image = nchw.transpose(0, 2, 3, 1)
    return image


class LatentSRPipeline:
    def __init__(
        self,
        unet: SDUNet,
        controlnet: ControlNet,
        vae: AutoencoderKL,
        sched: Schedule,
        unet_params: Any,
        controlnet_params: Any,
        vae_params: Any,
        prompt_embeds: jnp.ndarray,
        precompute_cond: bool = True,
        fused_towers: bool | None = None,
        prediction_type: str = "epsilon",
        adapter: Any = None,
    ):
        self.unet = unet
        self.controlnet = controlnet
        # T2I-Adapter serving mode (reference src/adapters/modules.py:114-157
        # hooked into the UNet down blocks, sd_unet.py:46-47): when
        # ``adapter`` is given the ``controlnet_params`` operand slot carries
        # the ADAPTER params and the ControlNet is unused.  Adapter features
        # depend only on the condition image — step-invariant, so they are
        # computed once per chain outside the scan (the same hoist as
        # ``precompute_cond`` for the ControlNet embedding).
        self.adapter = adapter
        if adapter is not None:
            fused_towers = False
        self.vae = vae
        self.sched = sched
        self.unet_params = unet_params
        self.controlnet_params = controlnet_params
        self.vae_params = vae_params
        self.prompt_embeds = prompt_embeds
        # Hoist the step-invariant ControlNet condition embedding out of the
        # K-step scan (computed once per chain, PERF.md round-13).  False
        # restores the in-scan embedding for A/B.
        self.precompute_cond = precompute_cond
        # Run the (topologically identical, dataflow-independent) UNet and
        # ControlNet down+mid towers as ONE vmapped program over a stacked
        # weight axis (models/fused.py).  Identical math either way;
        # measured +30% on chip at SD1.5 production shapes (2.05 -> 2.67
        # slices/s/chip, PERF.md round-13 A/B) — so the DEFAULT (None) is
        # auto: fuse whenever the two encoder configs match (always true
        # for a ControlNet built from_unet-style, the only kind the
        # reference path produces).  False forces the sequential program.
        from mrisr_tpu.models.fused import check_fusable

        if fused_towers is None:
            try:
                check_fusable(unet, controlnet)
                fused_towers = True
            except ValueError:
                fused_towers = False
        elif fused_towers:
            check_fusable(unet, controlnet)
        self.fused_towers = fused_towers
        # diffusers scheduler convention: "epsilon" (SD1.5 reference
        # setting) or "sample" (model predicts x0 — see
        # diffusion/res_shift.py::shift_reverse_step for when that matters).
        self.prediction_type = prediction_type
        # Program identity for the jit cache (see ResDiffPipeline): ``self``
        # is a static jit arg, params/prompt embeddings are TRACED operands
        # of ``super_resolve_with``, and the schedule arrays are constants
        # baked into the program — so two pipelines share a compiled program
        # iff (module configs, schedule contents) match.  id()-hashing (the
        # previous behavior) retraced per instance AND baked the full SD
        # param trees in as constants.
        digest = hashlib.sha1()
        for leaf in jax.tree_util.tree_leaves(sched):
            arr = np.asarray(leaf)
            digest.update(str(arr.shape).encode())
            digest.update(str(arr.dtype).encode())
            digest.update(arr.tobytes())
        self._static_key = (
            type(self), unet, controlnet, vae, digest.digest(), precompute_cond,
            fused_towers, prediction_type, adapter,
        )

    @functools.partial(jax.jit, static_argnames=("self", "num_inference_steps"))
    def super_resolve_with(
        self,
        unet_params: Any,
        controlnet_params: Any,
        vae_params: Any,
        prompt_embeds: jnp.ndarray,
        lr: jnp.ndarray,  # [B, H, W, 1] in [-1, 1]
        key: jax.Array,
        num_inference_steps: int = 20,
    ) -> jnp.ndarray:
        """Weights-as-operands variant: swapping params (LoRA merges,
        restored checkpoints, EMA snapshots) reuses the compiled program."""
        return self._super_resolve_impl(
            unet_params, controlnet_params, vae_params, prompt_embeds,
            lr, key, num_inference_steps,
        )

    def _super_resolve_impl(
        self,
        unet_params: Any,
        controlnet_params: Any,
        vae_params: Any,
        prompt_embeds: jnp.ndarray,
        lr: jnp.ndarray,
        key: jax.Array,
        num_inference_steps: int,
    ) -> jnp.ndarray:
        B = lr.shape[0]
        cond_image = prepare_condition_image(lr, (lr.shape[1], lr.shape[2]))
        lr_rgb = jnp.repeat(lr, 3, axis=-1) if lr.shape[-1] == 1 else lr

        key, k_enc = jax.random.split(key)
        anchor = (
            self.vae.apply(vae_params, lr_rgb, k_enc, method=self.vae.encode)
            * self.vae.scaling_factor
        )
        ctx = jnp.broadcast_to(
            prompt_embeds[:1], (B,) + prompt_embeds.shape[1:]
        )

        if self.adapter is not None:
            # controlnet_params slot carries the adapter params; features
            # are chain-invariant (condition-only), hoisted out of the scan.
            feats = self.adapter.apply(controlnet_params, cond_image)

            def eps_fn(x_t, t):
                return self.unet.apply(
                    unet_params, x_t, t, ctx, adapter_features=feats
                )

            latents = res_shift_sample(
                self.sched, eps_fn, anchor, key, num_steps=num_inference_steps,
                prediction_type=self.prediction_type,
            )
            img = self.vae.apply(
                vae_params, latents / self.vae.scaling_factor, method=self.vae.decode
            )
            return img

        cond_emb = None
        if self.precompute_cond or self.fused_towers:
            from mrisr_tpu.models.controlnet import embed_condition

            cond_emb = embed_condition(self.controlnet, controlnet_params, cond_image)

        if self.fused_towers:
            from mrisr_tpu.models.fused import fused_eps, stack_tower_params

            stacked = stack_tower_params(unet_params, controlnet_params)

            def eps_fn(x_t, t):
                return fused_eps(
                    self.unet, self.controlnet, unet_params, controlnet_params,
                    stacked, x_t, t, ctx, cond_emb,
                )
        else:
            def eps_fn(x_t, t):
                down_res, mid_res = self.controlnet.apply(
                    controlnet_params, x_t, t, ctx, cond_image,
                    cond_embedding=cond_emb,
                )
                return self.unet.apply(
                    unet_params,
                    x_t,
                    t,
                    ctx,
                    down_block_additional_residuals=down_res,
                    mid_block_additional_residual=mid_res,
                )

        latents = res_shift_sample(
            self.sched, eps_fn, anchor, key, num_steps=num_inference_steps,
            prediction_type=self.prediction_type,
        )
        img = self.vae.apply(
            vae_params, latents / self.vae.scaling_factor, method=self.vae.decode
        )
        return img  # [B, H, W, 3] in [-1, 1]

    def super_resolve(
        self,
        lr: jnp.ndarray,  # [B, H, W, 1] in [-1, 1]
        key: jax.Array,
        num_inference_steps: int = 20,
    ) -> jnp.ndarray:
        return self.super_resolve_with(
            self.unet_params, self.controlnet_params, self.vae_params,
            self.prompt_embeds, lr, key, num_inference_steps,
        )

    @functools.partial(jax.jit, static_argnames=("self", "num_inference_steps"))
    def super_resolve_many(
        self,
        unet_params: Any,
        controlnet_params: Any,
        vae_params: Any,
        prompt_embeds: jnp.ndarray,
        lr_stack: jnp.ndarray,  # [G, B, H, W, 1]
        keys: jax.Array,  # [G, 2]
        num_inference_steps: int = 20,
    ) -> jnp.ndarray:
        """G sequential 20-step latent chains in ONE program ``[G, B, ...]``
        in/out — the same volume-serving dispatch amortization as
        ``ResDiffPipeline.super_resolve_many`` (``resdiff.py:151``):
        ``lax.scan`` over the chain axis runs the chains back-to-back
        device-side so one host dispatch (and its ~10-60 ms relay overhead,
        PERF.md round-7) serves G batches.  Per-chain math is identical to
        :meth:`super_resolve_with`; memory stays flat (one chain's live set
        at a time plus the stacked IO)."""

        def body(carry, xs):
            lr, k = xs
            return carry, self._super_resolve_impl(
                unet_params, controlnet_params, vae_params, prompt_embeds,
                lr, k, num_inference_steps,
            )

        _, out = jax.lax.scan(body, (), (lr_stack, keys))
        return out

    def super_resolve_group(
        self,
        lr_stack: jnp.ndarray,  # [G, B, H, W, 1]
        keys: jax.Array,  # [G, 2]
        num_steps: int = 20,
    ) -> jnp.ndarray:
        """Uniform grouped-dispatch entry point (``pipelines/volume.py``
        calls this regardless of pipeline family)."""
        return self.super_resolve_many(
            self.unet_params, self.controlnet_params, self.vae_params,
            self.prompt_embeds, lr_stack, keys, num_steps,
        )

    def __hash__(self):
        return hash(self._static_key)

    def __eq__(self, other):
        return (
            isinstance(other, LatentSRPipeline)
            and self._static_key == other._static_key
        )


def decode_to_vis(img: jnp.ndarray) -> "Any":
    """[-1,1] NHWC -> uint8 numpy HWC (res_srdiff.py:107-122 semantics)."""
    import numpy as np

    arr = np.asarray(jnp.clip(img / 2 + 0.5, 0, 1))
    arr = (arr[0] * 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    return arr
