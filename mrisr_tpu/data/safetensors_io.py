"""Native .safetensors reader/writer (no safetensors dependency).

The reference loads pretrained SD1.5 checkpoints through diffusers, which
ships weights as ``.safetensors`` files.  The format is public and simple:

    [8-byte little-endian header length N][N bytes JSON header][raw data]

where the JSON maps tensor names to ``{"dtype", "shape", "data_offsets"}``
(offsets relative to the start of the data section) plus an optional
``__metadata__`` entry.  This module reads/writes it with numpy + mmap so
checkpoint conversion works in this hermetic image.
"""
from __future__ import annotations

import json
import mmap
from pathlib import Path

import numpy as np

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": None,  # handled specially (numpy has no bfloat16)
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}
_INV_DTYPES = {
    np.dtype(np.float64): "F64",
    np.dtype(np.float32): "F32",
    np.dtype(np.float16): "F16",
    np.dtype(np.int64): "I64",
    np.dtype(np.int32): "I32",
    np.dtype(np.int16): "I16",
    np.dtype(np.int8): "I8",
    np.dtype(np.uint8): "U8",
    np.dtype(np.bool_): "BOOL",
}


def _bf16_to_f32(raw: np.ndarray) -> np.ndarray:
    """uint16 bf16 bit patterns -> float32 (shift into the high half)."""
    u32 = raw.astype(np.uint32) << 16
    return u32.view(np.float32)


def load_safetensors(path: str | Path, upcast_bf16: bool = True) -> dict:
    """Read every tensor into a {name: np.ndarray} dict."""
    path = Path(path)
    with open(path, "rb") as f:
        header_len = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(header_len).decode("utf-8"))
        data_start = 8 + header_len
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
    out: dict = {}
    for name, spec in header.items():
        if name == "__metadata__":
            continue
        begin, end = spec["data_offsets"]
        buf = mm[data_start + begin : data_start + end]
        shape = tuple(spec["shape"])
        st_dtype = spec["dtype"]
        if st_dtype == "BF16":
            raw = np.frombuffer(buf, dtype=np.uint16).reshape(shape)
            out[name] = _bf16_to_f32(raw) if upcast_bf16 else raw
        else:
            np_dtype = _DTYPES.get(st_dtype)
            if np_dtype is None:
                raise ValueError(f"unsupported safetensors dtype {st_dtype!r} for {name}")
            out[name] = np.frombuffer(buf, dtype=np_dtype).reshape(shape).copy()
    mm.close()
    return out


def save_safetensors(path: str | Path, tensors: dict, metadata: dict | None = None):
    """Write a {name: np.ndarray} dict (fp32/fp16/int types) to disk."""
    header: dict = {}
    if metadata:
        header["__metadata__"] = {k: str(v) for k, v in metadata.items()}
    offset = 0
    blobs = []
    for name in sorted(tensors):
        arr = np.ascontiguousarray(tensors[name])
        if arr.dtype not in _INV_DTYPES:
            arr = arr.astype(np.float32)
        blob = arr.tobytes()
        header[name] = {
            "dtype": _INV_DTYPES[arr.dtype],
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(blob)],
        }
        offset += len(blob)
        blobs.append(blob)
    hjson = json.dumps(header, separators=(",", ":")).encode("utf-8")
    with open(path, "wb") as f:
        f.write(len(hjson).to_bytes(8, "little"))
        f.write(hjson)
        for blob in blobs:
            f.write(blob)


def load_torch_state_dict(path: str | Path) -> dict:
    """Load a torch ``.bin``/``.pt`` checkpoint to numpy (torch is CPU-only
    in this image; tensors are detached and converted)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.float().numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}


def load_state_dict_any(path: str | Path) -> dict:
    """Dispatch on extension: .safetensors (native) or torch pickle."""
    path = Path(path)
    if path.suffix == ".safetensors":
        return load_safetensors(path)
    return load_torch_state_dict(path)
