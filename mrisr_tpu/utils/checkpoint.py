"""Orbax checkpointing: save/restore train state by step, with retention.

Replaces the reference's ad-hoc ``torch.save`` checkpoints (SURVEY.md §5):
CNN ``cnn_weights_{epoch}_{SIZE}.pth``, diffusion ``save_network`` every
2,000 steps, and the combined ``last_train_checkpoint.pth`` dict of
``{'epoch','step','opt_state','model_state'}``.  Here the whole
``TrainState`` pytree (params, opt state, EMA, step) round-trips through
Orbax, restore-by-step or latest.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str | Path, max_to_keep: int = 5):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        saved = self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)
        self._mgr.wait_until_finished()
        return saved

    def restore(self, state_template: Any, step: int | None = None) -> Any:
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def all_steps(self) -> list[int]:
        return list(self._mgr.all_steps())

    def close(self):
        self._mgr.close()
