"""CLIP text encoder (ViT-L/14 text tower used by SD1.5), native Flax.

The reference encodes prompts through transformers' ``CLIPTextModel``
(``src/adapters/utils.py:117-145``; fixed-prompt variant at
``src/adapters/res_srdiff.py:125-130``).  Same math natively: token +
learned-position embeddings, pre-LN transformer with causal mask and
quick-GELU MLPs, final LayerNorm; pooled output = EOS-position hidden state.

Parity is tested against the torch ``CLIPTextModel`` (available offline) on
random weights via models/convert.py.

Tokenization note: CLIP's BPE vocab files cannot be downloaded in this
environment.  The framework therefore (a) accepts pre-computed input ids,
(b) ships :class:`HashTokenizer` — a deterministic stand-in with the same
call signature for hermetic runs, and (c) uses transformers' tokenizer when
its files are present locally.  The reference's fixed-prompt design means a
single cached embedding covers the entire SR training run.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import linen as nn


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPMLP(nn.Module):
    hidden: int
    intermediate: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.intermediate, name="fc1")(x)
        x = quick_gelu(x)
        return nn.Dense(self.hidden, name="fc2")(x)


class CLIPAttention(nn.Module):
    hidden: int
    heads: int

    @nn.compact
    def __call__(self, x, mask):
        b, n, _ = x.shape
        hd = self.hidden // self.heads
        q = nn.Dense(self.hidden, name="q_proj")(x) * (hd**-0.5)
        k = nn.Dense(self.hidden, name="k_proj")(x)
        v = nn.Dense(self.hidden, name="v_proj")(x)

        def split(t):
            return t.reshape(b, n, self.heads, hd).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bhnd,bhmd->bhnm", split(q), split(k))
        logits = logits + mask
        w = nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", w, split(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.hidden)
        return nn.Dense(self.hidden, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    hidden: int
    heads: int
    intermediate: int

    @nn.compact
    def __call__(self, x, mask):
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm1")(x)
        x = x + CLIPAttention(self.hidden, self.heads, name="self_attn")(h, mask)
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(x)
        return x + CLIPMLP(self.hidden, self.intermediate, name="mlp")(h)


class CLIPTextEncoder(nn.Module):
    vocab_size: int = 49408
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_positions: int = 77
    eos_token_id: int = 49407

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, output_hidden_states: bool = False):
        b, n = input_ids.shape
        tok = nn.Embed(self.vocab_size, self.hidden, name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (self.max_positions, self.hidden),
        )
        x = tok + pos[None, :n]

        causal = jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), k=1)[None, None]
        hidden_states = []
        for i in range(self.layers):
            hidden_states.append(x)
            x = CLIPEncoderLayer(
                self.hidden, self.heads, self.intermediate, name=f"layers_{i}"
            )(x, causal)
        hidden_states.append(x)
        x = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)

        # Pooled: hidden state at the first EOS token position per sequence.
        eos_pos = jnp.argmax((input_ids == self.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = x[jnp.arange(b), eos_pos]
        if output_hidden_states:
            return x, pooled, hidden_states
        return x, pooled


class HashTokenizer:
    """Deterministic stand-in tokenizer with the CLIP call signature.

    Maps words to stable ids via a hash; NOT the CLIP BPE vocabulary —
    use only for hermetic tests / fixed-prompt flows where the prompt
    embedding is trained jointly or cached (the reference's SR conditioning
    is a constant prompt; SURVEY.md §2 fixed-prompt row).
    """

    model_max_length = 77
    bos_token_id = 49406
    eos_token_id = 49407

    def __init__(self, vocab_size: int = 49408):
        self.vocab_size = vocab_size

    def __call__(self, texts, padding="max_length", max_length=None, truncation=True, **_):
        import hashlib

        if isinstance(texts, str):
            texts = [texts]
        max_length = max_length or self.model_max_length
        out = []
        for t in texts:
            ids = [self.bos_token_id]
            for w in t.lower().split():
                h = int(hashlib.md5(w.encode()).hexdigest(), 16)
                ids.append(h % (self.vocab_size - 2))
            ids = ids[: max_length - 1] + [self.eos_token_id]
            ids += [self.eos_token_id] * (max_length - len(ids))
            out.append(ids)
        return {"input_ids": np.asarray(out, np.int32)}


def default_tokenizer(vocab_dir=None):
    """Best available tokenizer: native CLIP BPE when vocab files exist
    (``vocab.json`` + ``merges.txt`` in ``vocab_dir``), HashTokenizer
    otherwise (hermetic runs with random/trained-from-scratch weights)."""
    if vocab_dir is not None:
        from pathlib import Path

        p = Path(vocab_dir)
        if (p / "vocab.json").exists() and (p / "merges.txt").exists():
            from mrisr_tpu.models.tokenizer import CLIPBPETokenizer

            return CLIPBPETokenizer.from_pretrained(p)
    return HashTokenizer()


def get_fixed_prompt_embeds(
    encoder: CLIPTextEncoder,
    params,
    tokenizer=None,
    prompt: str = "medical mri scan, high resolution",
) -> jnp.ndarray:
    """Pre-compute one frozen prompt embedding (res_srdiff.py:125-130)."""
    tokenizer = tokenizer or default_tokenizer()
    ids = jnp.asarray(tokenizer(prompt)["input_ids"])
    hidden, _ = encoder.apply(params, ids)
    return hidden
