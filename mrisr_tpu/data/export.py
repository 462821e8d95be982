"""Export per-slice .npz pairs to 8-bit PNG + HF-style metadata.jsonl.

Native equivalent of ``slicedMRI/generate_train.py``: normalises each array
to uint8 by its own min/max, writes ``hr_images/`` and ``lr_images``, and a
``metadata.jsonl`` row per pair.  Uses the ``"file_name"`` key — the HF
``imagefolder`` convention that the reference's shipped ``metadata.jsonl``
actually uses (the reference *code* writes ``"image"``; the fix happened
outside the code — SURVEY.md §2 exporter row).
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np


def normalize_to_uint8(arr: np.ndarray) -> np.ndarray:
    if arr.ndim == 3 and arr.shape[0] == 1:
        arr = arr[0]
    lo, hi = float(arr.min()), float(arr.max())
    if hi > lo:
        arr = (arr - lo) / (hi - lo)
    else:
        arr = np.zeros_like(arr)
    return (arr * 255).astype(np.uint8)


def export_png_dataset(
    source_dir: str | Path,
    dest_dir: str | Path,
    caption: str = "high quality mri scan",
) -> int:
    from PIL import Image

    source_dir, dest_dir = Path(source_dir), Path(dest_dir)
    hr_dir = dest_dir / "hr_images"
    lr_dir = dest_dir / "lr_images"
    hr_dir.mkdir(parents=True, exist_ok=True)
    lr_dir.mkdir(parents=True, exist_ok=True)

    count = 0
    with open(dest_dir / "metadata.jsonl", "w") as meta:
        for npz_path in sorted(source_dir.glob("*.npz")):
            try:
                with np.load(npz_path) as z:
                    hr, lr = z["hr"], z["lr"]
                base = npz_path.stem
                hr_rel = f"hr_images/{base}.png"
                lr_rel = f"lr_images/{base}.png"
                Image.fromarray(normalize_to_uint8(hr)).save(dest_dir / hr_rel)
                Image.fromarray(normalize_to_uint8(lr)).save(dest_dir / lr_rel)
                meta.write(
                    json.dumps(
                        {"file_name": hr_rel, "conditioning_image": lr_rel, "text": caption}
                    )
                    + "\n"
                )
                count += 1
            except Exception as e:  # skip corrupt entries, keep going
                print(f"skipping {npz_path}: {e}")
    return count
