"""Checkpointing with true mid-training resume (orbax).

The reference saves ``{epoch, model/optimizer/scheduler state, losses}`` at
best-val and final epoch (``train.py:250-259,297-306``) but can only load for
eval; here the full :class:`TrainState` (params, batch_stats, optimizer
state, step) round-trips, so training resumes exactly.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


class Checkpointer:
    """best / last / periodic checkpoint policy (reference train.py)."""

    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        self.best_val = float("inf")

    def _save(self, name: str, state: Any):
        path = os.path.join(self.directory, name)
        self._ckpt.save(path, state, force=True)

    def save_best(self, state, val_loss: float, epoch: int):
        if val_loss < self.best_val:
            self.best_val = val_loss
            self._save("best", state)

    def save_last(self, state, epoch: int):
        self._save("last", state)

    def restore(self, state_template: Any, name: str = "last"):
        path = os.path.join(self.directory, name)
        if not os.path.exists(path):
            return None
        return self._ckpt.restore(path, state_template)

    def wait(self):
        self._ckpt.wait_until_finished()

    def __del__(self):
        try:
            self._ckpt.wait_until_finished()
        except Exception:
            pass
