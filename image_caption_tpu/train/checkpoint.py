"""Orbax checkpointing: params + optimizer + step, atomic, resumable.

The reference saves bare ``state_dict`` pickles per epoch and never persists
optimizer state, so resume restarts Adam moments
(``/root/reference/core/models.py:62-68``, ``main.py:151``).  Here the full
TrainState round-trips through orbax with atomic writes and
resume-from-latest (SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import os
from typing import Optional

from .state import TrainState


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


class CheckpointManager:
    """Epoch-indexed checkpoints under ``{output_path}/model`` (the
    reference's layout, main.py:28-30) with keep-N rotation."""

    def __init__(self, directory: str, keep: int = 5):
        ocp = _ocp()
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=False),
        )

    def save(self, epoch: int, state: TrainState) -> None:
        ocp = _ocp()
        self._mgr.save(epoch, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def restore(self, epoch: int, template: TrainState) -> TrainState:
        ocp = _ocp()
        restored = self._mgr.restore(
            epoch, args=ocp.args.StandardRestore(template))
        return TrainState(*restored) if not isinstance(
            restored, TrainState) else restored

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_epochs(self):
        return sorted(self._mgr.all_steps())

    def close(self):
        self._mgr.close()
