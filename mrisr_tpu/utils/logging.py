"""Metric logging: console + JSONL file + optional experiment trackers.

Replaces the reference's print-based logging and the W&B integration it
reaches through the cloned ResDiff ``core.wandb_logger`` (SURVEY.md §5).
W&B is unavailable offline; the JSONL file is the durable record and a
wandb sink activates automatically when the package + network exist.
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any


class MetricLogger:
    def __init__(self, out_dir: str | Path | None = None, use_wandb: bool = False, project: str = "mrisr_tpu", config: dict | None = None):
        self.out_path = None
        if out_dir is not None:
            p = Path(out_dir)
            p.mkdir(parents=True, exist_ok=True)
            self.out_path = p / "metrics.jsonl"
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(project=project, config=config or {})
            except Exception as e:  # offline or not installed
                print(f"[logging] wandb unavailable ({e}); using JSONL only")

    def log(self, step: int, metrics: dict[str, Any], prefix: str = ""):
        payload = {f"{prefix}{k}": _to_py(v) for k, v in metrics.items()}
        payload["step"] = step
        payload["ts"] = time.time()
        line = " ".join(f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}" for k, v in payload.items() if k != "ts")
        print(f"[{step:>8d}] {line}")
        if self.out_path is not None:
            with open(self.out_path, "a") as f:
                f.write(json.dumps(payload) + "\n")
        if self._wandb is not None:
            self._wandb.log(payload, step=step)

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()


def _to_py(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v
