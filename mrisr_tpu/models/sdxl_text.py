"""SDXL dual-text-encoder prompt utilities, native Flax.

Rebuilds the reference's SDXL-shape prompt path
(``src/adapters/utils.py:76-113`` ``encode_prompt`` and ``:165-182``
``compute_embeddings``): two CLIP text towers (ViT-L 768-d and
OpenCLIP-bigG 1280-d with a linear text projection), penultimate hidden
states concatenated on channels, pooled projection from the second tower,
plus the SDXL ``add_time_ids`` micro-conditioning vector and the
empty-prompt CFG dropout (``proportion_empty_prompts``, ``:81``).

The towers reuse :class:`mrisr_tpu.models.clip_text.CLIPTextEncoder`;
tower 2 adds the bias-free ``text_projection`` used by transformers'
``CLIPTextModelWithProjection`` (parity-tested in tests/test_sdxl_text.py).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mrisr_tpu.models.clip_text import CLIPTextEncoder


class CLIPTextEncoderWithProjection(nn.Module):
    """CLIP text tower + linear projection (transformers
    ``CLIPTextModelWithProjection``): pooled output = EOS hidden state
    through a bias-free Dense."""

    vocab_size: int = 49408
    hidden: int = 1280
    layers: int = 32
    heads: int = 20
    intermediate: int = 5120
    max_positions: int = 77
    eos_token_id: int = 49407
    projection_dim: int = 1280

    def setup(self):
        self.text_model = CLIPTextEncoder(
            self.vocab_size,
            self.hidden,
            self.layers,
            self.heads,
            self.intermediate,
            self.max_positions,
            self.eos_token_id,
        )
        self.text_projection = nn.Dense(self.projection_dim, use_bias=False)

    def __call__(self, input_ids: jnp.ndarray, output_hidden_states: bool = False):
        out = self.text_model(input_ids, output_hidden_states=output_hidden_states)
        if output_hidden_states:
            hidden, pooled, states = out
            return hidden, self.text_projection(pooled), states
        hidden, pooled = out
        return hidden, self.text_projection(pooled)


def maybe_drop_prompts(
    prompts: Sequence[str],
    key: jax.Array | None = None,
    proportion_empty_prompts: float = 0.0,
    is_train: bool = True,
) -> list[str]:
    """CFG dropout: replace a fraction of prompts with "" during training
    (``src/adapters/utils.py:81,120`` semantics)."""
    if key is None or proportion_empty_prompts <= 0.0 or not is_train:
        return list(prompts)
    drop = np.asarray(jax.random.uniform(key, (len(prompts),)))
    return ["" if d < proportion_empty_prompts else p for d, p in zip(drop, prompts)]


def encode_prompt_sdxl(
    encoders,  # (CLIPTextEncoder, CLIPTextEncoderWithProjection)
    params,  # matching params pytrees
    tokenizers,  # matching tokenizers (CLIPBPETokenizer / HashTokenizer)
    prompts: Sequence[str],
    key: jax.Array | None = None,
    proportion_empty_prompts: float = 0.0,
    is_train: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dual-tower encoding (``utils.py:76-113``).

    Returns ``(prompt_embeds [B, 77, d1+d2], pooled [B, projection_dim])``:
    per tower the PENULTIMATE hidden state (``hidden_states[-2]``, i.e. the
    last layer's input before the final LayerNorm), channel-concatenated;
    pooled comes from the projection tower (tower 2).
    """
    prompts = maybe_drop_prompts(prompts, key, proportion_empty_prompts, is_train)
    embeds = []
    pooled = None
    for enc, p, tok in zip(encoders, params, tokenizers):
        ids = jnp.asarray(tok(list(prompts))["input_ids"])
        _, pool, states = enc.apply(p, ids, output_hidden_states=True)
        embeds.append(states[-2])
        pooled = pool  # keep the LAST tower's pooled output (utils.py:100)
    return jnp.concatenate(embeds, axis=-1), pooled


def make_add_time_ids(
    original_size: tuple[int, int],
    crops_coords_top_left: tuple[int, int],
    target_size: tuple[int, int],
    batch: int = 1,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """SDXL micro-conditioning vector (``utils.py:165-182`` ``add_time_ids``):
    ``[orig_h, orig_w, crop_top, crop_left, target_h, target_w]``."""
    ids = jnp.asarray(
        list(original_size) + list(crops_coords_top_left) + list(target_size),
        dtype=dtype,
    )
    return jnp.broadcast_to(ids[None], (batch, 6))


def compute_embeddings_sdxl(
    encoders,
    params,
    tokenizers,
    prompts: Sequence[str],
    original_size: tuple[int, int] = (1024, 1024),
    crops_coords_top_left: tuple[int, int] = (0, 0),
    target_size: tuple[int, int] = (1024, 1024),
    key: jax.Array | None = None,
    proportion_empty_prompts: float = 0.0,
    is_train: bool = True,
) -> dict:
    """``utils.py:165-182``: the UNet-ready SDXL conditioning dict."""
    prompt_embeds, pooled = encode_prompt_sdxl(
        encoders, params, tokenizers, prompts, key, proportion_empty_prompts, is_train
    )
    time_ids = make_add_time_ids(
        original_size, crops_coords_top_left, target_size,
        batch=prompt_embeds.shape[0], dtype=prompt_embeds.dtype,
    )
    return {
        "prompt_embeds": prompt_embeds,
        "text_embeds": pooled,
        "time_ids": time_ids,
    }


def encode_prompt_sd1x5(
    encoder: CLIPTextEncoder,
    params,
    tokenizer,
    prompts: Sequence[str],
    key: jax.Array | None = None,
    proportion_empty_prompts: float = 0.0,
    is_train: bool = True,
) -> jnp.ndarray:
    """Single-tower SD1.5 variant (``utils.py:117-145``): final hidden state."""
    prompts = maybe_drop_prompts(prompts, key, proportion_empty_prompts, is_train)
    ids = jnp.asarray(tokenizer(list(prompts))["input_ids"])
    hidden, _ = encoder.apply(params, ids)
    return hidden
