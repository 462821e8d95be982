"""Torch-checkpoint -> Flax-params converters.

The reference loads pretrained SD1.5 weights from HF hub
(``pretrained_model_name_or_path: "sd-legacy/stable-diffusion-v1-5"``,
config cell 11).  This environment has no network, so conversion is a
local, offline operation: given a torch ``state_dict`` (e.g. loaded from a
user-provided ``.safetensors``/``.bin``), these functions produce the
matching Flax parameter pytrees for models/clip_text.py, models/sd_unet.py,
models/vae.py and models/controlnet.py.

Orientation rules (torch -> flax):
* Linear ``[out, in]`` -> Dense kernel ``[in, out]`` (transpose)
* Conv2d ``[out, in, kh, kw]`` -> Conv kernel ``[kh, kw, in, out]``
* Norm ``weight``/``bias`` -> ``scale``/``bias``
* Embedding ``[num, dim]`` -> Embed ``embedding`` (unchanged)

CLIP conversion is verified bit-for-bit against transformers'
``CLIPTextModel`` in tests/test_sd_stack.py.
"""
from __future__ import annotations

from typing import Mapping

import numpy as np


def _t(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32)


def linear(sd: Mapping, prefix: str) -> dict:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def conv(sd: Mapping, prefix: str) -> dict:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def norm(sd: Mapping, prefix: str) -> dict:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def convert_clip_text(sd: Mapping, num_layers: int = 12) -> dict:
    """transformers CLIPTextModel state_dict -> CLIPTextEncoder params."""
    p = "text_model."
    if not any(k.startswith(p) for k in sd):
        p = ""
    params: dict = {
        "token_embedding": {
            "embedding": _t(sd[f"{p}embeddings.token_embedding.weight"])
        },
        "position_embedding": _t(sd[f"{p}embeddings.position_embedding.weight"]),
        "final_layer_norm": norm(sd, f"{p}final_layer_norm"),
    }
    for i in range(num_layers):
        lp = f"{p}encoder.layers.{i}"
        params[f"layers_{i}"] = {
            "layer_norm1": norm(sd, f"{lp}.layer_norm1"),
            "layer_norm2": norm(sd, f"{lp}.layer_norm2"),
            "self_attn": {
                "q_proj": linear(sd, f"{lp}.self_attn.q_proj"),
                "k_proj": linear(sd, f"{lp}.self_attn.k_proj"),
                "v_proj": linear(sd, f"{lp}.self_attn.v_proj"),
                "out_proj": linear(sd, f"{lp}.self_attn.out_proj"),
            },
            "mlp": {
                "fc1": linear(sd, f"{lp}.mlp.fc1"),
                "fc2": linear(sd, f"{lp}.mlp.fc2"),
            },
        }
    return {"params": params}


def convert_clip_text_with_projection(sd: Mapping, num_layers: int = 32) -> dict:
    """transformers CLIPTextModelWithProjection -> CLIPTextEncoderWithProjection.

    (The SDXL second tower; ``src/adapters/utils.py:100`` pooled output.)
    """
    inner = convert_clip_text(sd, num_layers)["params"]
    return {
        "params": {
            "text_model": inner,
            "text_projection": {"kernel": _t(sd["text_projection.weight"]).T},
        }
    }


# ---------------------------------------------------------------------------
# Generic diffusers-module conversion
# ---------------------------------------------------------------------------

_NORM_KEYS = ("norm", "layer_norm", "group_norm", "conv_norm_out", "norm1", "norm2", "norm3")


def convert_diffusers_tree(sd: Mapping) -> dict:
    """Best-effort diffusers state_dict -> nested flax dict.

    Mapping rules: path segments ``a.0.b`` -> ``a_0/b`` for the module lists
    our Flax modules name ``f"a_{i}"``; weight orientation per tensor rank
    (4D conv / 2D linear / 1D norm-or-bias).  ``to_out.0`` (Sequential with
    dropout) collapses to ``to_out``; ``ff.net.0/2`` map to ``net_0/net_2``.
    """
    tree: dict = {}
    for key, w in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        leaf = parts[-1]
        mods = parts[:-1]
        # collapse diffusers Sequential indices for to_out
        if len(mods) >= 2 and mods[-2] == "to_out" and mods[-1] == "0":
            mods = mods[:-1]
        if "net" in mods:
            i = mods.index("net")
            if i + 1 < len(mods) and mods[i + 1].isdigit():
                mods = mods[:i] + [f"net_{mods[i+1]}"] + mods[i + 2 :]
        # merge trailing numeric segments into flax-style names
        merged: list[str] = []
        for m in mods:
            if m.isdigit() and merged:
                merged[-1] = f"{merged[-1]}_{m}"
            else:
                merged.append(m)

        w = _t(w)
        if leaf == "weight":
            if w.ndim == 4:
                node = {"kernel": w.transpose(2, 3, 1, 0)}
            elif w.ndim == 2:
                node = {"kernel": w.T}
            else:
                node = {"scale": w}
        elif leaf == "bias":
            node = {"bias": w}
        else:
            node = {leaf: w}

        cur = tree
        for m in merged:
            cur = cur.setdefault(m, {})
        cur.update(node)
    return tree


def convert_sd_unet(sd: Mapping) -> dict:
    return {"params": convert_diffusers_tree(sd)}


def convert_controlnet(sd: Mapping) -> dict:
    return {"params": convert_diffusers_tree(sd)}


# Pre-0.15 diffusers stored VAE mid-block attention as query/key/value/
# proj_attn (sometimes as 1x1 convs); newer checkpoints use to_q/to_k/to_v/
# to_out.0 Linears.  convert_vae accepts both.
_VAE_ATTN_LEGACY = {"query": "to_q", "key": "to_k", "value": "to_v", "proj_attn": "to_out"}
_VAE_ATTN_PROJ = {"to_q", "to_k", "to_v", "to_out"}


def convert_vae(sd: Mapping) -> dict:
    """diffusers AutoencoderKL state_dict -> models/vae.py params.

    The Flax module tree mirrors the diffusers scheme 1:1 (encoder/decoder
    down_blocks.{i}.resnets.{j}, downsamplers.0, mid_block, quant_conv, ...)
    so the generic tree converter lands every tensor; this wrapper only
    normalizes legacy attention key names and squeezes 1x1-conv-stored
    attention projections to Linear orientation.
    """
    fixed: dict = {}
    for key, w in sd.items():
        parts = [_VAE_ATTN_LEGACY.get(p, p) for p in key.split(".")]
        w = _t(w)
        if w.ndim == 4 and any(p in _VAE_ATTN_PROJ for p in parts):
            w = w[:, :, 0, 0]  # [out, in, 1, 1] conv-projection -> Linear
        fixed[".".join(parts)] = w
    return {"params": convert_diffusers_tree(fixed)}


# ---------------------------------------------------------------------------
# Inverse mapping: flax param path -> diffusers state_dict key
# ---------------------------------------------------------------------------

# Flax module names whose trailing _{i} suffix denotes a diffusers
# ModuleList index (rendered ``name.{i}`` in torch state dicts).  Names like
# ``linear_1``/``norm1``/``fc1`` keep their literal spelling in diffusers.
_LIST_MODULES = {
    "down_blocks",
    "up_blocks",
    "resnets",
    "attentions",
    "downsamplers",
    "upsamplers",
    "transformer_blocks",
    "net",
    "blocks",
    "controlnet_down_blocks",
}

_LEAF_TO_TORCH = {"kernel": "weight", "scale": "weight", "embedding": "weight"}


def flax_path_to_diffusers_key(path: tuple[str, ...]) -> str:
    """('down_blocks_0','resnets_1','norm1','scale') -> 'down_blocks.0.resnets.1.norm1.weight'.

    Exact inverse of :func:`convert_diffusers_tree`'s name mapping; used by
    the pytree coverage tests and for exporting trained params back to the
    diffusers key scheme.
    """
    *mods, leaf = path
    out: list[str] = []
    for m in mods:
        stem, _, idx = m.rpartition("_")
        if idx.isdigit() and stem in _LIST_MODULES:
            out.extend([stem, idx])
        else:
            out.append(m)
        if m == "to_out":
            out.append("0")  # diffusers wraps the output proj in a Sequential
    return ".".join(out + [_LEAF_TO_TORCH.get(leaf, leaf)])


def flax_leaf_to_torch(leaf_name: str, w: np.ndarray) -> np.ndarray:
    """Orient one flax leaf the way the torch checkpoint stores it."""
    w = np.asarray(w)
    if leaf_name == "kernel":
        if w.ndim == 4:  # [kh, kw, in, out] -> [out, in, kh, kw]
            return w.transpose(3, 2, 0, 1)
        return w.T  # [in, out] -> [out, in]
    return w


def params_to_flat(params: Mapping, sep: str = "/") -> dict:
    """Nested params pytree -> flat {'a/b/c': array} dict (npz-friendly)."""
    out: dict = {}

    def walk(node, prefix):
        for k, v in node.items():
            key = f"{prefix}{sep}{k}" if prefix else str(k)
            if isinstance(v, Mapping) or hasattr(v, "items"):
                walk(v, key)
            else:
                out[key] = np.asarray(v)

    walk(params, "")
    return out


def flat_to_params(flat: Mapping, sep: str = "/") -> dict:
    """Inverse of :func:`params_to_flat`."""
    tree: dict = {}
    for key, v in flat.items():
        cur = tree
        parts = key.split(sep)
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = np.asarray(v)
    return tree


def save_params_npz(path, params: Mapping):
    np.savez_compressed(path, **params_to_flat(params))


def load_params_npz(path) -> dict:
    with np.load(path) as z:
        return flat_to_params({k: z[k] for k in z.files})


# Model-name -> (converter, description) registry for the CLI.
CONVERTERS = {
    "vae": convert_vae,
    "unet": convert_sd_unet,
    "controlnet": convert_controlnet,
    "clip": convert_clip_text,
    "clip-proj": convert_clip_text_with_projection,
}


def export_diffusers_tree(params: Mapping) -> dict:
    """Flax params pytree -> flat diffusers-style state dict (numpy)."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out: dict = {}
    for path, w in flat:
        names = tuple(getattr(p, "key", str(p)) for p in path)
        if names and names[0] == "params":
            names = names[1:]
        out[flax_path_to_diffusers_key(names)] = flax_leaf_to_torch(names[-1], w)
    return out
