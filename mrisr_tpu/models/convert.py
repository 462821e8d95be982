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
