"""In-training validation: sampler run + metrics + image strips.

The reference validates every ``val_freq=5000`` steps by running the full
reverse chain, computing PSNR/SSIM/NMSE/HFEN and logging wandb image strips
(``ResDif_execution.ipynb`` cell 46; per-epoch validation in cell 29).
This is the native equivalent: a hook the CLI training loops call every N
steps with the current (EMA) params; it samples a fixed validation batch,
computes :func:`compute_mri_metrics`, writes a ``lr|sr|hr`` PNG strip, and
returns the metric dict for the logger.
"""
from __future__ import annotations

from pathlib import Path
from typing import Callable

import jax
import numpy as np

from mrisr_tpu.eval.metrics import compute_mri_metrics


def save_image_strip(path: str | Path, *images: np.ndarray) -> None:
    """Save images side by side as one PNG ([H, W] or [H, W, 1], any range)."""
    from PIL import Image

    panels = []
    for img in images:
        arr = np.asarray(img, np.float32)
        if arr.ndim == 3:
            arr = arr[..., 0]
        lo, hi = float(arr.min()), float(arr.max())
        arr = (arr - lo) / (hi - lo) if hi > lo else np.zeros_like(arr)
        panels.append((arr * 255).astype(np.uint8))
    strip = np.hstack(panels)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(strip).save(path)


class ValidationHook:
    """Periodic sampler-based validation (cell 46 ``val_freq`` semantics).

    ``sample_fn(params, lr, key) -> sr`` runs the reverse chain (typically
    the jitted K-step DDIM program).  ``val_batch`` is a fixed ``{lr, hr}``
    NHWC dict in [-1, 1]; metrics are computed on [0, 1]-mapped tensors to
    match ``compute_mri_metrics`` (cell 29 semantics, data_range 1.0).
    """

    def __init__(
        self,
        sample_fn: Callable,
        val_batch: dict,
        out_dir: str | Path,
        every: int = 5000,
        max_strips: int = 4,
        data_in_unit_range: bool = False,
    ):
        self.sample_fn = sample_fn
        self.val_batch = val_batch
        self.out_dir = Path(out_dir)
        self.every = max(1, every)
        self.max_strips = max_strips
        self.data_in_unit_range = data_in_unit_range

    def _to_unit(self, x: np.ndarray) -> np.ndarray:
        if self.data_in_unit_range:
            return np.clip(x, 0.0, 1.0)
        return np.clip(x / 2.0 + 0.5, 0.0, 1.0)

    def run(self, params, key: jax.Array) -> dict:
        lr = self.val_batch["lr"]
        hr = self.val_batch["hr"]
        sr = np.asarray(self.sample_fn(params, lr, key))
        sr_u, hr_u = self._to_unit(sr), self._to_unit(np.asarray(hr))
        # compute_mri_metrics takes [B, C, H, W] (cell 29 convention)
        p, s, n, h = compute_mri_metrics(
            sr_u.transpose(0, 3, 1, 2), hr_u.transpose(0, 3, 1, 2)
        )
        metrics = {
            "val_psnr": float(p),
            "val_ssim": float(s),
            "val_nmse": float(n),
            "val_hfen": float(h),
        }
        lr_u = self._to_unit(np.asarray(lr))
        for b in range(min(self.max_strips, sr.shape[0])):
            save_image_strip(
                self.out_dir / f"val_{b:02d}.png", lr_u[b], sr_u[b], hr_u[b]
            )
        return metrics

    def maybe_run(self, step: int, params, key: jax.Array) -> dict | None:
        if step > 0 and step % self.every == 0:
            return self.run(params, key)
        return None
